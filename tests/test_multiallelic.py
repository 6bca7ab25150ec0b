"""Multi-allelic sites with GT values >= 10.

The device engine's posterior grouping uses packed numeric keys that match
std::map<string> ordering only for single-digit GTs; nodes carrying GT >= 10
must take the exact string fallback (engine_jax._posterior_string_fallback)
and still agree with the oracle (reference genotype.cpp:1441-1459 semantics:
"10" sorts before "2" lexicographically).
"""

import gzip
import os

import numpy as np
import pytest

from data_gen import make_genome, make_reads, write_fasta, write_fastq
from varigraph_tpu.config import VarigraphConfig
from varigraph_tpu.genotype.counting import count_reads
from varigraph_tpu.genotype.engine_jax import genotype_jax
from varigraph_tpu.genotype.engine_np import genotype_np, graph2node
from varigraph_tpu.index.build import construct_graph_index


N_ALT = 12  # GT values 0..12 -> double-digit genotypes present


@pytest.fixture(scope="module")
def multiallelic_case(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("multiallelic"))
    rng = np.random.default_rng(99)
    genome = make_genome(rng, {"chr1": 4000})
    seq = genome["chr1"]

    # one multi-allelic SNP-ish site per 500 bp: REF base -> 12 alternative
    # alleles (3 SNPs + 9 insertions of distinct 2-4 bp tails)
    positions = [600, 1200, 1800, 2400, 3000]
    bases = "ACGT"
    lines = []
    samples = tuple(f"P{i}" for i in range(6))  # 13 haplotypes incl. ref
    truth = {}
    for pos in positions:
        ref = seq[pos - 1]
        snps = [b for b in bases if b != ref]
        tails = ["AA", "CC", "GG", "TT", "ACG", "CGT", "GTA", "TACG", "CATG"]
        alts = snps + [ref + t for t in tails]
        assert len(alts) == N_ALT
        gts = []
        for si, s in enumerate(samples):
            # sample i is homozygous for allele 2*i+1 (so GTs reach 11/12)
            g = min(2 * si + 1, N_ALT)
            gts.append(f"{g}/{g}")
            truth[(s, pos)] = g
        lines.append(
            f"chr1\t{pos}\t.\t{ref}\t{','.join(alts)}\t30\t.\tNS=6\tGT\t"
            + "\t".join(gts)
        )
    header = [
        "##fileformat=VCFv4.2",
        '##INFO=<ID=NS,Number=1,Type=Integer,Description="x">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(samples),
    ]
    vcf_path = os.path.join(out, "vars.vcf.gz")
    with gzip.open(vcf_path, "wt") as fh:
        fh.write("\n".join(header + lines) + "\n")
    ref_path = os.path.join(out, "ref.fa")
    write_fasta(ref_path, genome)

    # reads for sample P5 (GT 11/11 at every site: allele = ref + "CATG")
    hap = dict(genome)
    edits = []
    for pos in positions:
        ref = seq[pos - 1]
        edits.append((pos, ref, ref + "CATG"))
    parts, cur = [], 0
    for pos, ref, alt in edits:
        parts.append(seq[cur : pos - 1])
        parts.append(alt)
        cur = pos - 1 + len(ref)
    parts.append(seq[cur:])
    hap["chr1"] = "".join(parts)
    reads = make_reads([hap], rng, depth=30.0, read_len=100)
    fq_path = os.path.join(out, "P5.fq.gz")
    write_fastq(fq_path, reads)

    cfg = VarigraphConfig(ref_file=ref_path, vcf_file=vcf_path, kmer_len=27,
                          seed=0)
    gi = construct_graph_index(cfg)
    graph2node(gi)
    gcfg = VarigraphConfig(kmer_len=27, vcf_ploidy=2, seed=0)
    read_base = count_reads(gi.table, [fq_path], 27, gcfg.read_batch_size,
                            gcfg.max_read_len)
    return gi, gcfg, read_base / gi.genome_size


def test_double_digit_gt_fallback_matches_oracle(multiallelic_case):
    gi, cfg, depth = multiallelic_case
    hap_cov = max(depth * 0.8 / 2, 1.0)
    res_np = genotype_np(gi, cfg, hap_cov, cfg.seed)
    res_jax = genotype_jax(gi, cfg, hap_cov, cfg.seed)
    assert set(res_np.keys()) == set(res_jax.keys())
    assert res_np, "no sites scored"
    node_by_pos = {
        (c, n.start): n for c in gi.graph.nodes for n in gi.graph.nodes[c]
    }
    saw_double_digit = False
    for key in res_np:
        node = node_by_pos[key]
        gt_np = sorted(node.hap_gt[h] for h in res_np[key].hap_vec) \
            if res_np[key].hap_vec else None
        gt_jax = sorted(node.hap_gt[h] for h in res_jax[key].hap_vec) \
            if res_jax[key].hap_vec else None
        assert gt_np == gt_jax, (key, gt_np, gt_jax)
        if gt_np and max(gt_np) >= 10:
            saw_double_digit = True
        assert res_np[key].uk == res_jax[key].uk
        assert res_np[key].kmer_num_vec == res_jax[key].kmer_num_vec
    assert saw_double_digit, "test never exercised a GT >= 10 call"
