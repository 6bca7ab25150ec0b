"""The JAX device engine must agree with the extended-precision oracle on
genotype calls (GT parity; GPP within float32 tolerance)."""

import os

import numpy as np
import pytest

from varigraph_tpu.config import VarigraphConfig
from varigraph_tpu.index.build import construct_graph_index
from varigraph_tpu.genotype.counting import count_reads
from varigraph_tpu.genotype.coverage import estimate_hap_coverage
from varigraph_tpu.genotype.engine_jax import genotype_jax
from varigraph_tpu.genotype.engine_np import genotype_np, graph2node

from data_gen import generate_dataset


@pytest.fixture(scope="module")
def ready_index(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("parity"))
    paths, truth = generate_dataset(
        out, seed=21, chrom_lens={"chr1": 6000}, n_variants=25,
        samples=("S1", "S2"), depth=30.0,
    )
    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    gi = construct_graph_index(cfg)
    graph2node(gi)
    gcfg = VarigraphConfig(kmer_len=27, vcf_ploidy=2, seed=0)
    read_base = count_reads(gi.table, [paths["fq"]], 27,
                            gcfg.read_batch_size, gcfg.max_read_len)
    read_depth = read_base / gi.genome_size
    hap_cov = estimate_hap_coverage(
        gi.table.cov_u8(), gi.table.freq_np(), gi.table.hap_words_np(),
        gi.nhap, gi.vcf_ploidy, 2, read_depth, False,
    )
    return gi, gcfg, hap_cov, truth


def _gt_of(gi, rec):
    node_by_pos = {
        (c, n.start): n for c in gi.graph.nodes for n in gi.graph.nodes[c]
    }
    out = {}
    for key, r in rec.items():
        node = node_by_pos[key]
        out[key] = sorted(node.hap_gt[h] for h in r.hap_vec) if r.hap_vec else None
    return out


@pytest.mark.parametrize("mode", ["rec", "fre"])
def test_jax_engine_matches_oracle(ready_index, mode):
    gi, cfg, hap_cov, _ = ready_index
    cfg.transition_pro_type = mode
    res_np = genotype_np(gi, cfg, hap_cov, cfg.seed)
    res_jax = genotype_jax(gi, cfg, hap_cov, cfg.seed)
    assert set(res_np.keys()) == set(res_jax.keys())
    gts_np = _gt_of(gi, res_np)
    gts_jax = _gt_of(gi, res_jax)
    mismatch = [k for k in gts_np if gts_np[k] != gts_jax[k]]
    assert not mismatch, f"GT mismatches: {mismatch[:5]}"
    for k in res_np:
        assert res_np[k].probability == pytest.approx(
            res_jax[k].probability, abs=2e-3
        ), k
        assert res_np[k].uk == res_jax[k].uk
        assert res_np[k].kmer_num_vec == res_jax[k].kmer_num_vec


def test_hom_mode_parity(ready_index):
    gi, cfg, hap_cov, _ = ready_index
    cfg.transition_pro_type = "rec"
    cfg.sample_type = "hom"
    try:
        res_np = genotype_np(gi, cfg, hap_cov, cfg.seed)
        res_jax = genotype_jax(gi, cfg, hap_cov, cfg.seed)
        assert _gt_of(gi, res_np) == _gt_of(gi, res_jax)
    finally:
        cfg.sample_type = "het"


def test_window_group_chunking_matches(ready_index, monkeypatch):
    """Forcing tiny window groups (device-memory bounding path) must not
    change any call."""
    import varigraph_tpu.genotype.engine_jax as ej

    gi, cfg, hap_cov, _ = ready_index
    cfg.transition_pro_type = "rec"
    old_gran = cfg.granularity_bp
    cfg.granularity_bp = 1000  # force several windows from the 6 kb genome
    try:
        res_full = genotype_jax(gi, cfg, hap_cov, cfg.seed)
        monkeypatch.setattr(ej, "_WINDOW_GROUP", 1)
        res_chunked = genotype_jax(gi, cfg, hap_cov, cfg.seed)
    finally:
        cfg.granularity_bp = old_gran
    assert set(res_full.keys()) == set(res_chunked.keys())
    for k in res_full:
        assert res_full[k].hap_vec == res_chunked[k].hap_vec, k
        assert res_full[k].probability == res_chunked[k].probability, k


def test_giant_window_emission_fallback(ready_index, monkeypatch):
    """Forcing _EMIT_ROWS below N exercises the giant-window branch
    (per-window node-chunked _emissions dispatches); results must equal
    the grouped-emissions default path exactly."""
    import varigraph_tpu.genotype.engine_jax as ej

    gi, cfg, hap_cov, _ = ready_index
    cfg.transition_pro_type = "rec"
    base = genotype_jax(gi, cfg, hap_cov, cfg.seed)
    monkeypatch.setattr(ej, "_EMIT_ROWS", 1)
    monkeypatch.setattr(ej, "_NODE_CHUNK", 4)
    got = genotype_jax(gi, cfg, hap_cov, cfg.seed)
    assert set(base.keys()) == set(got.keys()) and base
    for k in base:
        assert base[k].hap_vec == got[k].hap_vec, k
        assert abs(base[k].probability - got[k].probability) < 1e-6, k
