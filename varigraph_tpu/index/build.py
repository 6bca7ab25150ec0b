"""Construct phase: FASTA + VCF -> GraphIndex with a device k-mer table.

Pipeline (reference call stack, SURVEY.md section 3.1):
  1. read FASTA                       (build_fasta_index)
  2. genome counting Bloom filter    (make_mbf -- device sketch + scatter-add)
  3. VCF -> graph nodes              (construct, host)
  4. per-node haplotype contexts     (index/index_run -- contexts on host,
                                      sketch + CBF counts batched on device)
  5. merge into the global table     (host dict with int bitmasks)

Semantics preserved from reference src/construct_index.cpp:592-699,1125-1248:
  * per-haplotype context = allele +- (k-1) bases walked through the graph
  * per-node keep rule: MIN_KMER_FRE = min CBF frequency over all context
    k-mers (forced to 1 if 0 or --use-unique-kmers); keep freq <= MIN
  * global merge in node order: f increments per node (saturating), hap
    bitmaps OR; single-node k-mers with CBF freq >= 2 get f = CBF freq
  * ref flag: k-mer present in the genome CBF, carried by a non-REF allele,
    and absent from the node's REF-path (haplotype 0) context
    (construct_index.cpp:1211-1215)
  * additionally stores per-node local haplotype bitmasks (which haplotypes'
    contexts contain each k-mer AT THIS node) -- this precomputes the
    information the reference lazily re-derives at genotype time by
    re-sketching contexts (genotype.cpp:725-812), making the genotype-phase
    hidden-state correction a pure gather.
"""

from __future__ import annotations

import gzip
import os

import numpy as np

from ..config import VarigraphConfig
from ..io.fasta import read_fasta
from ..ops.cbf import CountingBloomFilter
from ..ops.kmer import pack_seqs, sketch_codes
from ..ops.table import KmerTable
from ..utils.log import log
from .graph import GenomeGraph, build_graph_from_vcf, find_node_up_down_seq
from .structs import GraphIndex

import jax.numpy as jnp

# feed the genome to the device sketch in chunks of this many bases
_GENOME_CHUNK = 32 * 1024 * 1024
# context batch: cap padded batch area (rows x padded len)
_CTX_BATCH_AREA = 8 * 1024 * 1024


def _open_text(path: str):
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rt")
    return open(path, "rt")


def make_genome_cbf(fasta_map: dict[str, str], genome_size: int, k: int,
                    seed: int) -> CountingBloomFilter:
    """Count k-mer frequencies of the reference genome into a CBF
    (reference make_mbf, construct_index.cpp:150-177)."""
    log("Initiating computation of k-mer frequencies in the reference genome ...")
    bf = CountingBloomFilter(n=genome_size - k + 1, p=0.01, seed=seed)
    from ..ops.sketch_ref import encode_bases_np

    for chrom, seq in fasta_map.items():
        codes_full = encode_bases_np(seq)
        n = len(codes_full)
        start = 0
        while start < n:
            # overlap k-1 so windows at the boundary are preserved; the warmup
            # counter re-warms within the overlap for any realistic sequence
            end = min(start + _GENOME_CHUNK, n)
            lo = max(0, start - (k - 1))
            chunk = codes_full[lo:end]
            # pad to a power of two (code 4 = ambiguous, never emits) to
            # bound XLA recompilation across chromosomes/chunks
            pad_len = 4096
            while pad_len < len(chunk):
                pad_len *= 2
            if pad_len != len(chunk):
                chunk = np.concatenate(
                    [chunk, np.full(pad_len - len(chunk), 4, np.uint8)]
                )
            values, emit = sketch_codes(jnp.asarray(chunk), k)
            if lo < start:
                # drop re-emissions of windows already counted by the
                # previous chunk (windows ending before 'start')
                emit = np.asarray(emit).copy()
                emit[: start - lo] = False
            bf.add(values, emit)
            start = end
        log(f"Chromosome '{chrom}' processed successfully ...")

    log("Counting Bloom Filter constructed successfully ...")
    log(f"Counting Bloom Filter size: {bf.size}")
    log(f"Hash functions count: {bf.num_hashes}")
    log(f"Counting Bloom Filter usage rate: {bf.occupancy():.2f}")
    return bf


def _sketch_contexts(contexts: list[str], k: int) -> list[np.ndarray]:
    """Sketch many context strings on device; returns per-context unique
    k-mer arrays (uint64).  Contexts are bucketed by length to bound padding
    waste."""
    order = sorted(range(len(contexts)), key=lambda i: len(contexts[i]))
    results: list[np.ndarray | None] = [None] * len(contexts)
    i = 0
    while i < len(order):
        # grow a batch while padded area stays within budget
        j = i
        batch_idx: list[int] = []
        max_len = 1
        while j < len(order):
            cand_len = max(max_len, len(contexts[order[j]]))
            if (len(batch_idx) + 1) * cand_len > _CTX_BATCH_AREA and batch_idx:
                break
            max_len = cand_len
            batch_idx.append(order[j])
            j += 1
        i = j
        seqs = [contexts[b] for b in batch_idx]
        # pad both dims to powers of two to bound XLA recompilation
        pad_len = 64
        while pad_len < max(max_len, k):
            pad_len *= 2
        codes = pack_seqs(seqs, max_len=pad_len)
        pad_rows = 1
        while pad_rows < codes.shape[0]:
            pad_rows *= 2
        if pad_rows != codes.shape[0]:
            codes = np.concatenate(
                [codes, np.full((pad_rows - codes.shape[0], pad_len), 4, np.uint8)]
            )
        values, emit = sketch_codes(jnp.asarray(codes), k)
        values = np.asarray(values)
        emit = np.asarray(emit)
        for row, b in enumerate(batch_idx):
            results[b] = np.unique(values[row][emit[row]])
    return results  # type: ignore[return-value]


def index_graph(graph: GenomeGraph, bf: CountingBloomFilter, k: int,
                nhap: int, vcf_ploidy: int, fast_mode: bool,
                use_unique_kmers: bool) -> dict[int, list]:
    """Build per-node k-mer sets and the global k-mer dictionary.

    Returns the global dict: hash -> [f, hapbits_int, refflag_bool].
    Side effect: fills node.kmer_hashes and node.local_bits.
    """
    log("Initiating the construction of the graph index ...")

    # ---- collect (node, hap, gt) context tasks in deterministic order ----
    tasks: list[tuple] = []  # (chrom, node_idx, node)
    for chrom in sorted(graph.nodes.keys()):
        starts = graph.starts[chrom]
        nodes = graph.nodes[chrom]
        for node_idx, node in enumerate(nodes):
            if not node.is_variant:
                continue
            tasks.append((chrom, node_idx, node))

    # ---- per-haplotype contexts ----
    contexts: list[str] = []
    ctx_meta: list[tuple[int, int, int]] = []  # (task_id, haplotype, gt)
    for task_id, (chrom, node_idx, node) in enumerate(tasks):
        starts = graph.starts[chrom]
        nodes = graph.nodes[chrom]
        hap_gt = node.hap_gt
        for haplotype in range(len(hap_gt)):
            gt = hap_gt[haplotype]
            if fast_mode and haplotype > 0 and gt == 0:
                group = (haplotype - 1) // vcf_ploidy
                lo = group * vcf_ploidy + 1
                hi = (group + 1) * vcf_ploidy
                if sum(hap_gt[lo : hi + 1]) == 0:
                    continue
            if gt >= len(node.seqs):
                raise ValueError(
                    f"The node '{chrom}-{node.start}' lacks sequence information "
                    f"for haplotype {gt}."
                )
            up, down, alt_seq = find_node_up_down_seq(
                haplotype, gt, node.seqs[gt], k - 1, node_idx, starts, nodes
            )
            contexts.append(up + alt_seq + down)
            ctx_meta.append((task_id, haplotype, gt))

    # ---- device sketch + CBF counts ----
    ctx_kmers = _sketch_contexts(contexts, k)
    all_kmers = (
        np.concatenate([c for c in ctx_kmers if len(c)])
        if any(len(c) for c in ctx_kmers)
        else np.empty(0, np.uint64)
    )
    uniq_kmers, inv = (
        np.unique(all_kmers, return_inverse=True)
        if len(all_kmers)
        else (np.empty(0, np.uint64), np.empty(0, np.int64))
    )
    uniq_counts = bf.count(uniq_kmers) if len(uniq_kmers) else np.empty(0, np.uint8)
    count_of = dict(zip(uniq_kmers.tolist(), uniq_counts.tolist()))

    # ---- per-node aggregation ----
    # node_agg[task_id]: (bits: {kmer: int_mask}, flag: {kmer: bool},
    #                     min_fre: int, fre_of: {kmer: freq})
    per_node_bits: list[dict[int, int]] = [dict() for _ in tasks]
    per_node_flag: list[set[int]] = [set() for _ in tasks]
    per_node_minfre: list[int] = [255] * len(tasks)

    for (task_id, haplotype, gt), kmers in zip(ctx_meta, ctx_kmers):
        if not len(kmers):
            continue
        bits = per_node_bits[task_id]
        flags = per_node_flag[task_id]
        hap_bit = 1 << haplotype
        minfre = per_node_minfre[task_id]
        for kh in kmers.tolist():
            fre = count_of[kh]
            if fre < minfre:
                minfre = fre
            prev = bits.get(kh, 0)
            bits[kh] = prev | hap_bit
            # ref flag: genome k-mer carried by a non-REF allele whose REF
            # path (haplotype 0, processed first) lacks it
            # (construct_index.cpp:1211-1215)
            if gt != 0 and fre >= 1 and (bits[kh] & 1) == 0:
                flags.add(kh)
        per_node_minfre[task_id] = minfre

    # ---- keep rule + global merge (node submission order) ----
    global_map: dict[int, list] = {}  # hash -> [f, bits_int, refflag]
    total_tasks = len(tasks)
    for task_id, (chrom, node_idx, node) in enumerate(tasks):
        minfre = per_node_minfre[task_id]
        if minfre == 0 or use_unique_kmers:
            minfre = 1
        bits = per_node_bits[task_id]
        flags = per_node_flag[task_id]
        kept = [kh for kh in bits if count_of[kh] <= minfre]
        kept.sort()
        node.kmer_hashes = kept
        node.local_bits = [bits[kh] for kh in kept]
        for kh in kept:
            entry = global_map.get(kh)
            flag = kh in flags
            if entry is None:
                global_map[kh] = [1, bits[kh], flag]
            else:
                entry[1] |= bits[kh]
                entry[2] |= flag
                if entry[0] < 255:
                    entry[0] += 1
        # fold CBF frequencies >= 2 for single-node k-mers
        # (construct_index.cpp:670-681)
        for kh in kept:
            fre = count_of[kh]
            if fre >= 2:
                entry = global_map[kh]
                if entry[0] == 1:
                    entry[0] += fre - 1
        if total_tasks >= 20 and (task_id + 1) % (total_tasks // 20) == 0:
            log(f"Indexing progress: {100.0 * (task_id + 1) / total_tasks:3.0f}%")

    return global_map


def build_kmer_table(global_map: dict[int, list], nhap: int) -> KmerTable:
    """Global dict -> dense sorted device table."""
    m = len(global_map)
    keys = np.fromiter(global_map.keys(), dtype=np.uint64, count=m)
    freq = np.zeros(m, np.uint8)
    refflag = np.zeros(m, bool)
    nbytes = (nhap + 7) // 8
    bit_bytes = np.zeros((m, nbytes), np.uint8)
    for i, (f, bits, flag) in enumerate(global_map.values()):
        freq[i] = f
        refflag[i] = flag
        if bits:
            bit_bytes[i] = np.frombuffer(bits.to_bytes(nbytes, "little"), np.uint8)
    bit_rows = np.unpackbits(bit_bytes, axis=1, bitorder="little")[:, :nhap]
    return KmerTable.build(keys, freq, bit_rows, refflag, nhap)


def construct_graph_index(config: VarigraphConfig) -> GraphIndex:
    """The full construct phase (reference Varigraph::construct,
    src/varigraph.cpp:14-54)."""
    fasta_map, len_map, genome_size = read_fasta(config.ref_file)

    bf = make_genome_cbf(fasta_map, genome_size, config.kmer_len, config.seed)

    log("Constructing ...")
    with _open_text(config.vcf_file) as fh:
        graph, vcf_head, vcf_info, hap_names, stats, extra_bases = build_graph_from_vcf(
            fh, fasta_map, config.vcf_ploidy
        )

    global_map = index_graph(
        graph, bf, config.kmer_len, len(hap_names), config.vcf_ploidy,
        config.fast_mode, config.use_unique_kmers,
    )
    table = build_kmer_table(global_map, len(hap_names))

    gi = GraphIndex(
        kmer_len=config.kmer_len,
        vcf_ploidy=config.vcf_ploidy,
        graph_base_num=genome_size + extra_bases,
        genome_size=genome_size,
        hap_names=hap_names,
        chrom_lens=dict(len_map),
        vcf_head=vcf_head,
        vcf_info=vcf_info,
        graph=graph,
        table=table,
        stats=stats,
    )
    log(f"Total number of bases in the Genome Graph: {gi.graph_base_num}")
    log(f"Total number of k-mers present in the Genome Graph: {table.size}")
    log(f"Total number of haplotypes present in the Genome Graph: {gi.nhap}")
    return gi
