"""Mode coverage: tetraploid, hom, use-depth, sv-only, fast,
use-unique-kmers, multi-sample loop with state reset."""

import gzip
import os

import numpy as np
import pytest

from varigraph_tpu.config import VarigraphConfig
from varigraph_tpu.index.build import construct_graph_index
from varigraph_tpu.index.serialize import load_graph, save_graph
from varigraph_tpu.genotype.counting import count_reads
from varigraph_tpu.genotype.coverage import estimate_hap_coverage
from varigraph_tpu.genotype.engine_jax import genotype_jax
from varigraph_tpu.genotype.engine_np import genotype_np, graph2node
from varigraph_tpu.genotype.pipeline import genotype_one_sample, run_genotype

from data_gen import generate_dataset


def _build(out, **kw):
    paths, truth = generate_dataset(out, **kw)
    cfg = VarigraphConfig(
        ref_file=paths["ref"], vcf_file=paths["vcf"], kmer_len=27, seed=0,
        vcf_ploidy=kw.get("ploidy", 2),
    )
    gi = construct_graph_index(cfg)
    graph2node(gi)
    return paths, truth, gi


def _count_and_cov(gi, paths, sample_ploidy=2, use_depth=False):
    cfg = VarigraphConfig(kmer_len=gi.kmer_len, vcf_ploidy=gi.vcf_ploidy,
                          sample_ploidy=sample_ploidy, use_depth=use_depth,
                          seed=0)
    read_base = count_reads(gi.table, [paths["fq"]], gi.kmer_len,
                            cfg.read_batch_size, cfg.max_read_len)
    rd = read_base / gi.genome_size
    hap_cov = estimate_hap_coverage(
        gi.table.cov_u8(), gi.table.freq_np(), gi.table.hap_words_np(),
        gi.nhap, gi.vcf_ploidy, sample_ploidy, rd, use_depth,
    )
    return cfg, hap_cov


def _gts(gi, res):
    node_by_pos = {(c, n.start): n for c in gi.graph.nodes
                   for n in gi.graph.nodes[c]}
    return {
        k: sorted(node_by_pos[k].hap_gt[h] for h in r.hap_vec)
        for k, r in res.items() if r.hap_vec
    }


def test_tetraploid_pipeline(tmp_path):
    paths, truth, gi = _build(
        str(tmp_path), seed=31, chrom_lens={"chr1": 4000}, n_variants=15,
        samples=("S1", "S2"), ploidy=4, depth=40.0,
    )
    assert gi.vcf_ploidy == 4
    assert gi.nhap == 1 + 2 * 4
    cfg, hap_cov = _count_and_cov(gi, paths, sample_ploidy=4)
    cfg.sample_ploidy = 4
    res_np = genotype_np(gi, cfg, hap_cov, 0)
    res_jax = genotype_jax(gi, cfg, hap_cov, 0)
    gt_np, gt_jax = _gts(gi, res_np), _gts(gi, res_jax)
    assert gt_np == gt_jax
    # every called GT has 4 alleles
    for v in gt_np.values():
        assert len(v) == 4
    # concordance against simulated truth
    n_eval = n_match = 0
    for key, hap_gts in truth.items():
        exp = sorted(hap_gts)
        if exp == [0, 0, 0, 0]:
            continue
        n_eval += 1
        if gt_np.get(key) == exp:
            n_match += 1
    assert n_eval > 0
    assert n_match / n_eval >= 0.6, f"{n_match}/{n_eval}"


def test_use_depth(tmp_path):
    paths, truth, gi = _build(
        str(tmp_path), seed=32, chrom_lens={"chr1": 3000}, n_variants=10,
        samples=("S1",), depth=30.0,
    )
    cfg, hap_cov = _count_and_cov(gi, paths, use_depth=True)
    # homCoverage = int(read_depth * 0.8); hap_cov = homCoverage / 2
    assert hap_cov > 0
    res = genotype_jax(gi, cfg, hap_cov, 0)
    assert len(res) > 0


def test_sv_only_filters_small_variants(tmp_path):
    # dataset with small variants only -> --sv yields no calls
    paths, truth, gi = _build(
        str(tmp_path), seed=33, chrom_lens={"chr1": 3000}, n_variants=10,
        samples=("S1",), depth=30.0,
    )
    cfg, hap_cov = _count_and_cov(gi, paths)
    cfg.sv_genotype_only = True
    res = genotype_jax(gi, cfg, hap_cov, 0)
    assert len(res) == 0


def test_fast_and_unique_kmers_construct(tmp_path):
    paths, truth = generate_dataset(
        str(tmp_path), seed=34, chrom_lens={"chr1": 3000}, n_variants=10,
        samples=("S1", "S2"), depth=20.0,
    )
    base = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                           kmer_len=27, seed=0)
    gi0 = construct_graph_index(base)
    fast = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                           kmer_len=27, seed=0, fast_mode=True)
    gi1 = construct_graph_index(fast)
    uniq = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                           kmer_len=27, seed=0, use_unique_kmers=True)
    gi2 = construct_graph_index(uniq)
    # fast mode skips all-zero-GT samples' contexts: table can only shrink
    assert gi1.table.size <= gi0.table.size
    # unique-kmers restricts to CBF frequency 1
    assert gi2.table.size <= gi0.table.size


def test_multi_sample_loop_and_reset(tmp_path):
    out = str(tmp_path)
    paths, truth = generate_dataset(
        out, seed=35, chrom_lens={"chr1": 3000}, n_variants=10,
        samples=("S1",), depth=25.0,
    )
    gpath = os.path.join(out, "g.vgt")
    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    save_graph(construct_graph_index(cfg), gpath)

    # same reads listed as two samples: outputs must be identical
    cfg2 = os.path.join(out, "two.cfg")
    with open(cfg2, "w") as fh:
        fh.write(f"A {paths['fq']}\nB {paths['fq']}\n")
    gcfg = VarigraphConfig(input_graph_file=gpath, samples_config_file=cfg2,
                           seed=0, engine="jax")
    outs = run_genotype(gcfg, out_dir=out)
    assert len(outs) == 2
    with gzip.open(outs[0], "rt") as a, gzip.open(outs[1], "rt") as b:
        a_body = [l for l in a if not l.startswith("#")]
        b_body = [l for l in b if not l.startswith("#")]
    assert a_body == b_body
    assert len(a_body) > 0
