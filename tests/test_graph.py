"""Tests for VCF -> graph construction and the up/down context walker."""

import numpy as np
import pytest

from varigraph_tpu.index.graph import (
    build_graph_from_vcf,
    find_node_up_down_seq,
    gt_split,
)


def test_gt_split():
    assert gt_split(".") == []
    assert gt_split("0/1") == ["0", "1"]
    assert gt_split("1|2") == ["1", "2"]
    assert gt_split("1") == ["1"]
    with pytest.raises(ValueError):
        gt_split("x")


def _mini_vcf(records, samples=("S1",)):
    head = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(samples),
    ]
    return head + records


def test_build_graph_basic():
    #            1234567890123456789012345
    fasta = {"chr1": "ACGTACGTACGTACGTACGTACGTA"}
    vcf = _mini_vcf([
        "chr1\t5\t.\tA\tT\t30\t.\t.\tGT\t0/1",
        "chr1\t10\t.\tC\tCAAA\t30\t.\t.\tGT\t1/1",
    ])
    graph, head, vcf_info, hap_names, stats, extra = build_graph_from_vcf(
        vcf, fasta, 2
    )
    assert hap_names == ["reference", "S1", "S1"]
    # small insertions fall into the "InDels" length bucket
    # (construct_index.cpp:525)
    assert stats.snp == 1 and stats.indel == 1
    nodes = graph.nodes["chr1"]
    starts = graph.starts["chr1"]
    # head filler [1..4], SNP at 5, filler [6..9], INS at 10, tail [11..25]
    assert starts == [1, 5, 6, 10, 11]
    assert nodes[0].seqs == ["ACGT"] and not nodes[0].is_variant
    assert nodes[1].seqs == ["A", "T"] and list(nodes[1].hap_gt) == [0, 0, 1]
    assert nodes[2].seqs == ["CGTA"]
    assert nodes[3].seqs == ["C", "CAAA"] and list(nodes[3].hap_gt) == [0, 1, 1]
    assert nodes[4].seqs == [fasta["chr1"][10:]]
    assert extra == 1 + 4
    # vcf mirror keeps normalized GT strings
    assert vcf_info["chr1"][5][:5] == ["chr1", "5", ".", "A", "T"]
    assert vcf_info["chr1"][5][9] == "0|1"  # all sample GTs, tab-joined
    assert "##FORMAT=<ID=GT" in head and "#CHROM" in head


def test_build_graph_skips_duplicates_and_unsorted(capsys):
    fasta = {"chr1": "ACGTACGTACGTACGTACGTACGTA"}
    vcf = _mini_vcf([
        "chr1\t5\t.\tA\tT\t30\t.\t.\tGT\t0/1",
        "chr1\t5\t.\tA\tC\t30\t.\t.\tGT\t1/1",  # duplicate -> skipped
        "chr1\t3\t.\tG\tC\t30\t.\t.\tGT\t1/1",  # unsorted -> skipped
    ])
    graph, _, vcf_info, _, stats, _ = build_graph_from_vcf(vcf, fasta, 2)
    nodes = graph.nodes["chr1"]
    variant_nodes = [n for n in nodes if n.is_variant]
    assert len(variant_nodes) == 1
    assert variant_nodes[0].seqs == ["A", "T"]
    # the vcf mirror appends columns even for skipped records (reference
    # behavior: vcf_construct runs before the skip checks); each record adds
    # 9 fixed columns + one tab-joined sample-GT element
    assert len(vcf_info["chr1"][5]) == 20
    # stats counted all three records
    assert stats.snp == 3


def test_ref_mismatch_repair():
    fasta = {"chr1": "AAAAAAAAAA"}
    vcf = _mini_vcf(["chr1\t5\t.\tC\tG\t30\t.\t.\tGT\t0/1"])
    graph, _, vcf_info, _, _, _ = build_graph_from_vcf(vcf, fasta, 2)
    node = [n for n in graph.nodes["chr1"] if n.is_variant][0]
    assert node.seqs[0] == "A"  # repaired from the FASTA
    assert vcf_info["chr1"][5][3] == "C"  # mirror keeps the VCF's REF


def test_missing_gt_and_ploidy_padding():
    fasta = {"chr1": "ACGTACGTACGTACGTACGT"}
    vcf = _mini_vcf(["chr1\t5\t.\tA\tT\t30\t.\t.\tGT\t."])
    graph, _, _, _, _, _ = build_graph_from_vcf(vcf, fasta, 2)
    node = [n for n in graph.nodes["chr1"] if n.is_variant][0]
    assert list(node.hap_gt) == [0, 0, 0]


def _walker_graph(records, fasta):
    graph, *_ = build_graph_from_vcf(_mini_vcf(records), fasta, 2)
    return graph.starts["chr1"], graph.nodes["chr1"]


def test_up_down_simple():
    fasta = {"chr1": "AACCGGTTAACCGGTTAACCGGTT"}
    starts, nodes = _walker_graph(["chr1\t9\t.\tA\tT\t30\t.\t.\tGT\t0/1"], fasta)
    node_idx = starts.index(9)
    # haplotype 2 (alt): context 4 bases each side
    up, down, alt = find_node_up_down_seq(2, 1, "T", 4, node_idx, starts, nodes)
    assert up == fasta["chr1"][4:8]
    assert down == fasta["chr1"][9:13]
    assert alt == "T"
    # haplotype 0 (ref path)
    up0, down0, alt0 = find_node_up_down_seq(0, 0, "A", 4, node_idx, starts, nodes)
    assert (up0, down0, alt0) == (up, down, "A")


def test_up_down_through_adjacent_variant():
    # two SNPs close together: the walker must substitute the neighbor's allele
    fasta = {"chr1": "AACCGGTTAACCGGTTAACCGGTT"}
    starts, nodes = _walker_graph(
        [
            "chr1\t9\t.\tA\tT\t30\t.\t.\tGT\t1/1",
            "chr1\t11\t.\tC\tG\t30\t.\t.\tGT\t1/1",
        ],
        fasta,
    )
    idx11 = starts.index(11)
    up, down, alt = find_node_up_down_seq(1, 1, "G", 4, idx11, starts, nodes)
    # upstream of pos 11 for hap 1: positions 7..10 with pos 9 -> T: "TTTA"
    assert up == "TTTA"  # ref 7,8 = TT; 9 = T (alt); 10 = A
    assert down == fasta["chr1"][11:15]


def test_snp_inside_deletion_replacement():
    # The reference's own example (construct_index.cpp:1406-1428):
    #   Node1: DEL  TTTTTTT -> T   GT 0/1
    #   Node2: SNP  T -> A         GT 1/1
    # For haplotype with del GT 0 (keeps TTTTTTT) and SNP GT 1, the walked
    # sequence must become TATTTTT (SNP applied inside the deletion span).
    seq = "AAAA" + "TTTTTTT" + "CCCC"
    fasta = {"chr1": seq}
    starts, nodes = _walker_graph(
        [
            "chr1\t5\t.\tTTTTTTT\tT\t30\t.\t.\tGT\t0/1",
            "chr1\t6\t.\tT\tA\t30\t.\t.\tGT\t1/1",
        ],
        fasta,
    )
    idx5 = starts.index(5)
    node5 = nodes[idx5]
    # haplotype 1: del GT 0, SNP GT 1
    assert node5.hap_gt[1] == 0
    up, down, alt = find_node_up_down_seq(
        1, 0, node5.seqs[0], 4, idx5, starts, nodes
    )
    assert alt == "TATTTTT"
    assert up == "AAAA"
    assert down == "CCCC"


def test_deletion_truncates_downstream_ref():
    # haplotype carrying a deletion: downstream context resumes after the
    # deleted span (GT 0 nodes inside the deletion are truncated)
    seq = "AAAA" + "TTTTTTT" + "CCCCGGGG"
    fasta = {"chr1": seq}
    starts, nodes = _walker_graph(
        ["chr1\t5\t.\tTTTTTTT\tT\t30\t.\t.\tGT\t1/1"], fasta
    )
    idx5 = starts.index(5)
    node5 = nodes[idx5]
    up, down, alt = find_node_up_down_seq(
        1, 1, node5.seqs[1], 4, idx5, starts, nodes
    )
    assert alt == "T"
    assert up == "AAAA"
    assert down == "CCCC"
