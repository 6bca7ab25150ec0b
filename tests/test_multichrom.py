"""Multi-chromosome runs: construct + genotype over 3 chromosomes, checked
against the simulated truth and (when the reference binary is built) against
its output on the same data.

Exercises the cross-chromosome paths no single-chrom test touches: the
previous-chromosome tail filler in the VCF graph builder
(index/graph.py, reference construct_index.cpp:447-460), per-chromosome
window scheduling, and the per-chrom HMM loops in both engines.
"""

import gzip
import os
import subprocess

from ref_util import run_reference

from varigraph_tpu.config import VarigraphConfig
from varigraph_tpu.index.build import construct_graph_index
from varigraph_tpu.index.serialize import load_graph, save_graph
from varigraph_tpu.genotype.engine_np import graph2node
from varigraph_tpu.genotype.pipeline import genotype_one_sample

from data_gen import generate_dataset

import pytest

REF_BIN = "/root/repo/.ref_build/varigraph"
CHROMS = {"chrA": 6000, "chrB": 5000, "chrC": 4000}


@pytest.fixture(scope="module")
def mc_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mc"))
    paths, truth = generate_dataset(
        out, seed=41, chrom_lens=CHROMS, n_variants=15,
        samples=("S1", "S2"), depth=30.0, target_sample="S1",
    )
    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    gi = construct_graph_index(cfg)
    gpath = os.path.join(out, "graph.vgt")
    save_graph(gi, gpath)
    gi2 = load_graph(gpath)
    graph2node(gi2)
    gcfg = VarigraphConfig(kmer_len=27, vcf_ploidy=2, engine="jax", seed=0)
    vcf_out = genotype_one_sample(gi2, gcfg, "S1", [paths["fq"]], out_dir=out)
    return paths, truth, gi2, vcf_out, out


def _gt_map(vcf_path):
    out = {}
    with gzip.open(vcf_path, "rt") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            out[(f[0], int(f[1]))] = sorted(f[9].split(":")[0].split("/"))
    return out


def test_all_chromosomes_present(mc_run):
    _, _, gi, vcf_out, _ = mc_run
    assert sorted(gi.graph.nodes.keys()) == sorted(CHROMS)
    called = _gt_map(vcf_out)
    chroms_called = {c for c, _ in called}
    assert chroms_called == set(CHROMS), chroms_called


def test_multichrom_truth_concordance(mc_run):
    _, truth, _, vcf_out, _ = mc_run
    called = _gt_map(vcf_out)
    n_eval = n_match = 0
    for (chrom, pos), hap_gts in truth.items():
        expected = sorted(hap_gts)
        if expected == [0, 0]:
            continue
        n_eval += 1
        got = called.get((chrom, pos))
        if got is not None and sorted(int(g) for g in got) == expected:
            n_match += 1
    assert n_eval >= 20
    assert n_match / n_eval >= 0.9, f"{n_match}/{n_eval}"


def test_vcf_record_order_follows_input(mc_run):
    """Output records iterate chromosomes in the VCF mirror's order and
    positions ascending within each (reference GENOTYPE::save)."""
    _, _, _, vcf_out, _ = mc_run
    seen = []
    with gzip.open(vcf_out, "rt") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.split("\t")
            seen.append((f[0], int(f[1])))
    per_chrom_starts = {}
    for c, p in seen:
        per_chrom_starts.setdefault(c, []).append(p)
    for c, ps in per_chrom_starts.items():
        assert ps == sorted(ps), f"{c} positions out of order"
    # grouped: a chromosome never reappears after another started
    firsts = [c for i, c in enumerate([s[0] for s in seen])
              if i == 0 or seen[i - 1][0] != c]
    assert len(firsts) == len(set(firsts))


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference binary not built")
def test_multichrom_interop_parity(mc_run):
    paths, _, _, ours_vcf, out = mc_run
    graph_bin = os.path.join(out, "graph.bin")
    run_reference(
        ["construct", "-r", paths["ref"], "-v", paths["vcf"],
         "--save-graph", graph_bin, "-t", "2"],
    )
    cfg_path = os.path.join(out, "ref_samples.cfg")
    with open(cfg_path, "w") as fh:
        fh.write(f"S1 {paths['fq']}\n")
    run_reference(
        ["genotype", "--load-graph", graph_bin, "-s", cfg_path, "-t", "2"],
        cwd=out,
    )
    ref = _gt_map(os.path.join(out, "S1.varigraph.vcf.gz"))
    ours = _gt_map(ours_vcf)
    assert {c for c, _ in ref} == set(CHROMS)
    shared = set(ours) & set(ref)
    assert len(shared) >= max(len(ref) - 3, 1)
    mismatch = [s for s in shared if ours[s] != ref[s]]
    assert len(mismatch) <= max(1, len(shared) // 10), (
        f"GT mismatches vs reference binary: {mismatch}"
    )
