"""Multi-host genotyping: a 2-process CPU run (jax.distributed + Gloo
collectives) must produce a VCF byte-identical to the single-process run,
for BOTH engines (np oracle and the jax device engine).

Each process streams its round-robin share of the sample's FASTQ files;
per-host counts merge with one cross-host collective
(parallel/dist.merge_counts_across_hosts); process 0 writes the VCF.
"""

import gzip
import os
import socket
import subprocess
import sys

from varigraph_tpu.config import VarigraphConfig
from varigraph_tpu.index.build import construct_graph_index
from varigraph_tpu.index.serialize import save_graph

from data_gen import generate_dataset


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _split_fastq(src: str, outs: list[str]) -> None:
    fhs = [gzip.open(p, "wt") for p in outs]
    with gzip.open(src, "rt") as fh:
        rec, n = [], 0
        for line in fh:
            rec.append(line)
            if len(rec) == 4:
                fhs[n % len(fhs)].writelines(rec)
                rec, n = [], n + 1
    for fh in fhs:
        fh.close()


import pytest


@pytest.mark.parametrize("engine", ["np", "jax"])
def test_two_process_run_matches_single(tmp_path, engine):
    out = str(tmp_path)
    paths, _ = generate_dataset(
        out, seed=23, chrom_lens={"chr1": 5000}, n_variants=20,
        samples=("S1", "S2"), depth=25.0, target_sample="S1",
    )
    fqs = [os.path.join(out, f"S1_{i}.fq.gz") for i in range(2)]
    _split_fastq(paths["fq"], fqs)
    cfg_file = os.path.join(out, "samples2.cfg")
    with open(cfg_file, "w") as fh:
        fh.write("S1 " + " ".join(fqs) + "\n")

    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    gi = construct_graph_index(cfg)
    gpath = os.path.join(out, "graph.vgt")
    save_graph(gi, gpath)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    def run_cli(extra, run_dir):
        os.makedirs(run_dir, exist_ok=True)
        return subprocess.Popen(
            [sys.executable, "-m", "varigraph_tpu", "genotype",
             "--load-graph", gpath, "-s", cfg_file, "--engine", engine,
             "--seed", "7", "--out-dir", run_dir] + extra,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )

    # single-process reference run
    single_dir = os.path.join(out, "single")
    p = run_cli([], single_dir)
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err[-2000:]

    # two coordinated processes
    port = _free_port()
    multi_dir = os.path.join(out, "multi")
    procs = [
        run_cli(["--coordinator", f"localhost:{port}",
                 "--num-processes", "2", "--process-id", str(i)], multi_dir)
        for i in range(2)
    ]
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=600)
        errs.append(err)
        assert p.returncode == 0, err[-2000:]
    assert any("merged counts from 2 hosts" in e for e in errs)

    with gzip.open(os.path.join(single_dir, "S1.varigraph.vcf.gz"), "rb") as a:
        single = a.read()
    with gzip.open(os.path.join(multi_dir, "S1.varigraph.vcf.gz"), "rb") as b:
        multi = b.read()
    assert single == multi, "2-process VCF differs from single-process VCF"
