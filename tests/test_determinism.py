"""Cross-process determinism: two fresh CLI-style processes with the same
--seed must produce byte-identical VCFs.

Guards the window RNG seeding (engine_np.window_rng_seed): Python's salted
str hash previously leaked into the per-window PCG64 stream, so identical
runs in different processes drew different Dirichlet samples.  The two
subprocesses here run with explicitly different PYTHONHASHSEED values to
pin that failure mode down.
"""

import gzip
import os
import subprocess
import sys

from varigraph_tpu.config import VarigraphConfig
from varigraph_tpu.index.build import construct_graph_index
from varigraph_tpu.index.serialize import save_graph

from data_gen import generate_dataset

_CHILD = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from varigraph_tpu.config import VarigraphConfig
from varigraph_tpu.index.serialize import load_graph
from varigraph_tpu.genotype.engine_np import graph2node
from varigraph_tpu.genotype.pipeline import genotype_one_sample

gi = load_graph({gpath!r})
cfg = VarigraphConfig(
    input_graph_file={gpath!r}, samples_config_file={cfgfile!r},
    kmer_len=gi.kmer_len, vcf_ploidy=gi.vcf_ploidy, engine="np", seed=7,
)
graph2node(gi)
genotype_one_sample(gi, cfg, "S1", [{fq!r}], out_dir={out!r})
"""


def test_same_seed_across_processes(tmp_path):
    out = str(tmp_path)
    paths, _ = generate_dataset(
        out, seed=31, chrom_lens={"chr1": 5000}, n_variants=20,
        samples=("S1", "S2"), depth=25.0, target_sample="S1",
    )
    cfg = VarigraphConfig(
        ref_file=paths["ref"], vcf_file=paths["vcf"], kmer_len=27, seed=0,
    )
    gi = construct_graph_index(cfg)
    gpath = os.path.join(out, "graph.vgt")
    save_graph(gi, gpath)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vcfs = []
    for i, hashseed in enumerate(("1", "424242")):
        run_dir = os.path.join(out, f"run{i}")
        os.makedirs(run_dir)
        env = dict(os.environ)
        env["PYTHONHASHSEED"] = hashseed
        env["JAX_PLATFORMS"] = "cpu"
        code = _CHILD.format(
            repo=repo, gpath=gpath, cfgfile=paths["cfg"], fq=paths["fq"],
            out=run_dir,
        )
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        vcfs.append(os.path.join(run_dir, "S1.varigraph.vcf.gz"))

    with gzip.open(vcfs[0], "rb") as a, gzip.open(vcfs[1], "rb") as b:
        body_a, body_b = a.read(), b.read()
    assert body_a == body_b, "same --seed produced different VCFs across processes"
