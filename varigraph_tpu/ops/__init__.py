from .kmer import encode_bases, sketch_codes, sketch_seq, KMER_SPAN_BITS
from .murmur3 import murmur3_x64_128_u64key
from .cbf import CountingBloomFilter
from .table import KmerTable
