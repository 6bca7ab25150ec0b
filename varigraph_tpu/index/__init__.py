from .graph import GenomeGraph, Node, gt_split, find_node_up_down_seq
from .build import construct_graph_index
from .structs import GraphIndex
