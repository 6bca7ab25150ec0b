"""Cross-validation against the reference binary: load its graph.bin, and
compare genotype outputs end-to-end on shared data."""

import gzip
import os
import subprocess

from ref_util import run_reference

import numpy as np
import pytest

from varigraph_tpu.config import VarigraphConfig
from varigraph_tpu.index.build import construct_graph_index
from varigraph_tpu.index.serialize import load_graph
from varigraph_tpu.genotype.engine_np import graph2node
from varigraph_tpu.genotype.pipeline import genotype_one_sample

from data_gen import generate_dataset

REF_BIN = "/root/repo/.ref_build/varigraph"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN), reason="reference binary not built"
)


@pytest.fixture(scope="module")
def shared_data(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("interop"))
    paths, truth = generate_dataset(
        out, seed=77, chrom_lens={"chr1": 6000}, n_variants=20,
        samples=("S1", "S2"), depth=30.0,
    )
    # reference construct + genotype
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
    return paths, out, graph_bin, os.path.join(out, "S1.varigraph.vcf.gz")


def _gt_map(vcf_path):
    out = {}
    with gzip.open(vcf_path, "rt") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            out[(f[0], int(f[1]))] = sorted(f[9].split(":")[0].split("/"))
    return out


def test_load_reference_graph_bin(shared_data):
    paths, out, graph_bin, _ = shared_data
    gi = load_graph(graph_bin)
    assert gi.kmer_len == 27
    assert gi.vcf_ploidy == 2
    assert gi.hap_names[0] == "reference"
    assert gi.hap_names[1:] == ["S1", "S1", "S2", "S2"]
    assert gi.table.size > 0
    # local bitmasks were reconstructed for nodes with k-mers
    some = 0
    for chrom in gi.graph.nodes:
        for n in gi.graph.nodes[chrom]:
            if n.is_variant and len(n.kmer_hashes):
                assert len(n.local_bits) == len(n.kmer_hashes)
                some += 1
    assert some > 0


def test_genotype_from_reference_graph_matches_reference_output(shared_data):
    paths, out, graph_bin, ref_vcf = shared_data
    gi = load_graph(graph_bin)
    graph2node(gi)
    cfg = VarigraphConfig(kmer_len=gi.kmer_len, vcf_ploidy=gi.vcf_ploidy,
                          engine="np", seed=0)
    ours_vcf = genotype_one_sample(gi, cfg, "S1", [paths["fq"]],
                                   out_dir=os.path.join(out, "ours"))
    ours = _gt_map(ours_vcf)
    ref = _gt_map(ref_vcf)
    shared = set(ours) & set(ref)
    assert len(shared) >= max(len(ref) - 2, 1)
    mismatch = [s for s in shared if ours[s] != ref[s]]
    assert len(mismatch) <= max(1, len(shared) // 10), (
        f"GT mismatches vs reference binary: {mismatch}"
    )


def test_reference_binary_genotypes_from_our_graph_bin(shared_data):
    """Round-trip the OTHER way: our construct -> save_reference_graph_bin ->
    the reference binary loads it and genotypes; its calls must agree with
    its own-graph run (reference src/construct_index.cpp:760-902 writer
    parity)."""
    from varigraph_tpu.index.interop import (
        load_reference_graph_bin,
        save_reference_graph_bin,
    )

    paths, out, _, ref_vcf = shared_data
    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    gi = construct_graph_index(cfg)
    ours_bin = os.path.join(out, "ours_graph.bin")
    save_reference_graph_bin(gi, ours_bin)

    # 1. our own reader round-trips the file byte-semantically
    gi2 = load_reference_graph_bin(ours_bin)
    assert gi2.kmer_len == gi.kmer_len and gi2.vcf_ploidy == gi.vcf_ploidy
    assert gi2.hap_names == gi.hap_names
    assert gi2.table.size == gi.table.size
    assert (gi2.table.keys_np() == gi.table.keys_np()).all()
    assert (gi2.table.freq_np() == gi.table.freq_np()).all()
    assert (gi2.table.refflag_np() == gi.table.refflag_np()).all()
    assert (gi2.table.hap_words_np() == gi.table.hap_words_np()).all()

    # 2. the reference binary genotypes from our index
    cfg_path = os.path.join(out, "ours_samples.cfg")
    with open(cfg_path, "w") as fh:
        fh.write(f"S1 {paths['fq']}\n")
    rundir = os.path.join(out, "refrun")
    os.makedirs(rundir, exist_ok=True)
    run_reference(
        ["genotype", "--load-graph", ours_bin, "-s", cfg_path, "-t", "2"],
        cwd=rundir,
    )
    got = _gt_map(os.path.join(rundir, "S1.varigraph.vcf.gz"))
    ref = _gt_map(ref_vcf)
    shared = set(got) & set(ref)
    assert len(shared) >= max(len(ref) - 2, 1)
    mismatch = [s for s in shared if got[s] != ref[s]]
    assert len(mismatch) <= max(1, len(shared) // 10), (
        f"GT mismatches (reference binary on OUR graph.bin): {mismatch}"
    )


def test_our_construct_matches_reference_output(shared_data):
    """Full independence check: OUR construct + genotype vs the reference
    binary's output on the same inputs."""
    paths, out, _, ref_vcf = shared_data
    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    gi = construct_graph_index(cfg)
    graph2node(gi)
    gcfg = VarigraphConfig(kmer_len=27, vcf_ploidy=2, engine="jax", seed=0)
    ours_vcf = genotype_one_sample(gi, gcfg, "S1", [paths["fq"]],
                                   out_dir=os.path.join(out, "ours2"))
    ours = _gt_map(ours_vcf)
    ref = _gt_map(ref_vcf)
    shared = set(ours) & set(ref)
    assert len(shared) >= max(len(ref) - 2, 1)
    mismatch = [s for s in shared if ours[s] != ref[s]]
    assert len(mismatch) <= max(1, len(shared) // 10), (
        f"GT mismatches vs reference binary: {mismatch}"
    )
