"""Interop: read AND write the reference binary's graph.bin format.

Parses/produces the little-endian layout of the reference's
ConstructIndex::save_index (src/construct_index.cpp:760-902) / load_index
(:911-1105): header (graphBaseNum u64, kmerLen u32, vcfPloidy u32), VCF head
+ per-site column mirror with chromosome lengths, haplotype registry, graph
nodes (allele sequences, per-haplotype GTs, k-mer hashes), a u64 ReadBase
placeholder, then (kmerHash u64, c u8, f u8, bitVecLen u64, bits...) records
to EOF.

This lets a reference-built index be genotyped with this framework AND an
index built here be genotyped by the reference binary (two-way
cross-validation).  The reference format carries no per-node local haplotype
bitmasks, so on load they are reconstructed by re-sketching each node's
haplotype contexts -- exactly the computation the reference defers to
genotype time (src/genotype.cpp:725-812).
"""

from __future__ import annotations

import struct

import numpy as np

from ..ops.kmer import pack_seqs, sketch_codes
from ..ops.table import KmerTable
from ..utils.log import log
from .graph import GenomeGraph, VariantStats, find_node_up_down_seq
from .structs import GraphIndex


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u8(self):
        v = self.data[self.pos]
        self.pos += 1
        return v

    def u16(self):
        (v,) = struct.unpack_from("<H", self.data, self.pos)
        self.pos += 2
        return v

    def u32(self):
        (v,) = struct.unpack_from("<I", self.data, self.pos)
        self.pos += 4
        return v

    def u64(self):
        (v,) = struct.unpack_from("<Q", self.data, self.pos)
        self.pos += 8
        return v

    def bytes_(self, n):
        v = self.data[self.pos : self.pos + n]
        self.pos += n
        return v

    def str_(self, n):
        return self.bytes_(n).decode("utf-8")

    def eof(self):
        return self.pos >= len(self.data)


def load_reference_graph_bin(path: str) -> GraphIndex:
    log(f"Reference-format Genome Graph index loaded from file: {path}")
    with open(path, "rb") as fh:
        r = _Reader(fh.read())

    graph_base_num = r.u64()
    kmer_len = r.u32()
    vcf_ploidy = r.u32()

    # ---- VCF head + vcfInfoMap (with chromosome lengths) ----
    vcf_head = r.str_(r.u32())
    vcf_info: dict[str, dict[int, list[str]]] = {}
    chrom_lens: dict[str, int] = {}
    n_chr = r.u32()
    for _ in range(n_chr):
        chrom = r.str_(r.u32())
        chrom_lens[chrom] = r.u32()
        nstart = r.u32()
        smap: dict[int, list[str]] = {}
        for _ in range(nstart):
            start = r.u32()
            ninfo = r.u32()
            cols = [r.str_(r.u32()) for _ in range(ninfo)]
            # compact mirror convention (index/graph.py): fold everything
            # past the 9 fixed columns into one tab-joined element
            smap[start] = (cols[:9] + ["\t".join(cols[9:])]
                           if len(cols) > 9 else cols)
        vcf_info[chrom] = smap

    # ---- haplotype registry ----
    hap_num = r.u16()
    hap_names_map: dict[int, str] = {}
    for _ in range(hap_num):
        idx = r.u16()
        hap_names_map[idx] = r.str_(r.u32())
    hap_names = [hap_names_map[i] for i in range(hap_num)]

    # ---- graph nodes ----
    graph = GenomeGraph()
    n_graph_chr = r.u32()
    for _ in range(n_graph_chr):
        chrom = r.str_(r.u32())
        n_nodes = r.u32()
        for _ in range(n_nodes):
            start = r.u32()
            node = graph.get_or_create(chrom, start)
            n_seq = r.u32()
            for _ in range(n_seq):
                node.seqs.append(r.str_(r.u32()))
            n_gt = r.u32()
            node.hap_gt = list(
                np.frombuffer(r.bytes_(2 * n_gt), dtype="<u2").astype(int)
            )
            n_km = r.u32()
            node.kmer_hashes = np.frombuffer(
                r.bytes_(8 * n_km), dtype="<u8"
            ).astype(np.uint64)
            node.local_bits = []
    graph.finalize()

    # ---- global k-mer table ----
    r.u64()  # ReadBase placeholder (construct_index.cpp:877-878)
    keys, covs, freqs, flags, bit_bytes_list = [], [], [], [], []
    nbytes = (hap_num + 7) // 8
    while not r.eof():
        kh = r.u64()
        c = r.u8()
        f = r.u8()
        blen = r.u64()
        bits = np.frombuffer(r.bytes_(blen), dtype=np.uint8).copy()
        keys.append(kh)
        covs.append(c)
        freqs.append(f)
        # last-byte bit 7 is the genome-wide ref flag; strip it so only
        # haplotype bits remain in the packed row
        flags.append(bool(bits[-1] >> 7) if blen else False)
        if blen:
            bits[-1] &= 0x7F
        row = np.zeros(nbytes, np.uint8)
        row[: min(blen, nbytes)] = bits[:nbytes]
        bit_bytes_list.append(row)

    m = len(keys)
    keys_a = np.array(keys, np.uint64)
    freq_a = np.array(freqs, np.uint8)
    flag_a = np.array(flags, bool)
    bytes_a = (
        np.stack(bit_bytes_list) if m else np.zeros((0, nbytes), np.uint8)
    )
    table = KmerTable.build_packed(keys_a, freq_a, bytes_a, flag_a, hap_num)
    # preserve any stored coverage (normally zero after construct)
    if any(covs):
        import jax.numpy as jnp

        order = np.argsort(keys_a, kind="stable")
        table.cov = jnp.asarray(np.array(covs, np.uint32)[order])

    genome_size = sum(chrom_lens.values())
    gi = GraphIndex(
        kmer_len=kmer_len,
        vcf_ploidy=vcf_ploidy,
        graph_base_num=graph_base_num,
        genome_size=genome_size,
        hap_names=hap_names,
        chrom_lens=chrom_lens,
        vcf_head=vcf_head,
        vcf_info=vcf_info,
        graph=graph,
        table=table,
        stats=VariantStats(),
    )
    rebuild_local_bits(gi)
    log(f"Total number of bases in the Genome Graph: {graph_base_num}")
    log(f"Total number of k-mers present in the Genome Graph: {table.size}")
    log(f"Total number of haplotypes present in the Genome Graph: {hap_num}")
    return gi


def save_reference_graph_bin(gi: GraphIndex, path: str) -> None:
    """Write ``gi`` in the reference binary's graph.bin layout
    (ConstructIndex::save_index, src/construct_index.cpp:760-902), so the
    reference binary can genotype from an index built by this framework.

    Iteration orders mirror the C++ std::map semantics: chromosomes
    lexicographic, node starts / VCF starts / haplotype indices ascending.
    The k-mer records' order is free (the reference loads them into an
    unordered_map, :1060-1101); they are written in sorted-key order.
    BitVec length is (hapNum >> 3) + 1 with bit 7 of the last byte carrying
    the genome-wide ref flag (src/construct_index.cpp:1206-1215)."""
    log(f"Reference-format Genome Graph index saved to file: {path}")
    import io

    # buffered stream straight to the file: a BytesIO of the node section
    # is ~the whole genome of allele text (~4 GB of extra peak RSS at the
    # 3 Gbp human scale)
    fh_out = open(path, "wb")
    w = io.BufferedWriter(fh_out, buffer_size=4 << 20)
    w.write(struct.pack("<QII", gi.graph_base_num, gi.kmer_len, gi.vcf_ploidy))

    # ---- VCF head + vcfInfoMap (with chromosome lengths) ----
    head = gi.vcf_head.encode("utf-8")
    w.write(struct.pack("<I", len(head)))
    w.write(head)
    w.write(struct.pack("<I", len(gi.vcf_info)))
    for chrom in sorted(gi.vcf_info.keys()):
        cb = chrom.encode("utf-8")
        w.write(struct.pack("<I", len(cb)))
        w.write(cb)
        w.write(struct.pack("<I", gi.chrom_lens[chrom]))
        smap = gi.vcf_info[chrom]
        w.write(struct.pack("<I", len(smap)))
        for start in sorted(smap.keys()):
            # expand the compact mirror (per-sample GTs tab-joined into one
            # element, index/graph.py) back to the reference's one string
            # per column
            infos = []
            for e in smap[start]:
                infos.extend(e.split("\t")) if e else infos.append(e)
            w.write(struct.pack("<II", start, len(infos)))
            for info in infos:
                ib = info.encode("utf-8")
                w.write(struct.pack("<I", len(ib)))
                w.write(ib)

    # ---- haplotype registry ----
    w.write(struct.pack("<H", gi.nhap))
    for idx, name in enumerate(gi.hap_names):
        nb = name.encode("utf-8")
        w.write(struct.pack("<HI", idx, len(nb)))
        w.write(nb)

    # ---- graph nodes ----
    w.write(struct.pack("<I", len(gi.graph.nodes)))
    for chrom in sorted(gi.graph.nodes.keys()):
        cb = chrom.encode("utf-8")
        w.write(struct.pack("<I", len(cb)))
        w.write(cb)
        nodes = gi.graph.nodes[chrom]
        w.write(struct.pack("<I", len(nodes)))
        for node in nodes:
            w.write(struct.pack("<II", node.start, len(node.seqs)))
            for seq in node.seqs:
                sb = seq.encode("utf-8")
                w.write(struct.pack("<I", len(sb)))
                w.write(sb)
            w.write(struct.pack("<I", len(node.hap_gt)))
            w.write(np.asarray(node.hap_gt, dtype="<u2").tobytes())
            w.write(struct.pack("<I", len(node.kmer_hashes)))
            w.write(np.asarray(node.kmer_hashes, dtype="<u8").tobytes())

    # ---- global k-mer table ----
    w.write(struct.pack("<Q", 0))  # ReadBase placeholder (:877-878)
    m = gi.table.size
    blen = (gi.nhap >> 3) + 1
    nbytes = (gi.nhap + 7) // 8
    rec = np.zeros(
        m,
        dtype=np.dtype(
            [("kh", "<u8"), ("c", "u1"), ("f", "u1"), ("blen", "<u8"),
             ("bits", "u1", (blen,))],
            align=False,
        ),
    )
    rec["kh"] = gi.table.keys_np()
    rec["c"] = gi.table.cov_u8()
    rec["f"] = gi.table.freq_np()
    rec["blen"] = blen
    hap_bytes = (
        np.ascontiguousarray(gi.table.hap_words_np()).view(np.uint8)
        if _np_little()
        else _words_to_bytes(gi.table.hap_words_np())
    )
    take = min(nbytes, hap_bytes.shape[1], blen)
    rec["bits"][:, :take] = hap_bytes[:, :take]
    rec["bits"][:, blen - 1] |= (
        gi.table.refflag_np().astype(np.uint8) << 7
    )
    w.flush()
    w.detach()  # disarm the wrapper so fh_out isn't double-closed
    rec.tofile(fh_out)
    fh_out.close()


def _np_little() -> bool:
    import sys

    return sys.byteorder == "little"


def _words_to_bytes(words: np.ndarray) -> np.ndarray:
    """[M, W] uint32 -> [M, W*4] little-endian bytes (big-endian hosts)."""
    m, w_ = words.shape
    out = np.zeros((m, w_ * 4), np.uint8)
    for j in range(4):
        out[:, j::4] = ((words >> np.uint32(8 * j)) & np.uint32(0xFF)).astype(
            np.uint8
        )
    return out


def rebuild_local_bits(gi: GraphIndex) -> None:
    """Reconstruct per-node local haplotype bitmasks by re-sketching every
    haplotype context (the computation the reference performs lazily during
    genotyping, src/genotype.cpp:725-812)."""
    import jax.numpy as jnp

    k = gi.kmer_len
    contexts: list[str] = []
    meta: list[tuple[str, int, int]] = []  # (chrom, node_idx, haplotype)
    for chrom in sorted(gi.graph.nodes.keys()):
        starts = gi.graph.starts[chrom]
        nodes = gi.graph.nodes[chrom]
        for node_idx, node in enumerate(nodes):
            if not node.is_variant or not len(node.kmer_hashes):
                if node.is_variant:
                    node.local_bits = []
                continue
            for hap in range(len(node.hap_gt)):
                gt = node.hap_gt[hap]
                if gt >= len(node.seqs):
                    raise ValueError(
                        f"Node '{chrom}-{node.start}' lacks sequence for GT {gt}"
                    )
                up, down, alt = find_node_up_down_seq(
                    hap, gt, node.seqs[gt], k - 1, node_idx, starts, nodes
                )
                contexts.append(up + alt + down)
                meta.append((chrom, node_idx, hap))

    # device-batched sketch (same bucketing as the construct pipeline)
    from .build import _sketch_contexts

    ctx_kmers = _sketch_contexts(contexts, k)

    nbytes = (gi.nhap + 7) // 8
    for chrom in gi.graph.nodes:
        for node in gi.graph.nodes[chrom]:
            if node.is_variant:
                node.local_bits = np.zeros(
                    (len(node.kmer_hashes), nbytes), np.uint8
                )
    for (chrom, node_idx, hap), kmers in zip(meta, ctx_kmers):
        node = gi.graph.nodes[chrom][node_idx]
        if not len(node.kmer_hashes) or not len(kmers):
            continue
        present = np.isin(
            np.asarray(node.kmer_hashes, np.uint64), kmers
        )
        node.local_bits[present, hap >> 3] |= np.uint8(1 << (hap & 7))
