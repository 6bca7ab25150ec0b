from .fasta import read_fasta
from .fastq import stream_read_batches
from .gzout import GzWriter
