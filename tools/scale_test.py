"""Scale validation: ~10 Mb genome, thousands of variants, full pipeline
with per-phase timing, cross-checked against the reference binary.

Usage: python tools/scale_test.py [workdir] [--genome-mb N] [--variants N]
"""

import argparse
import gzip
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/vg_scale")
    ap.add_argument("--genome-mb", type=float, default=10.0)
    ap.add_argument("--variants", type=int, default=5000)
    ap.add_argument("--depth", type=float, default=12.0)
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    t_all = time.perf_counter()

    from data_gen import generate_dataset

    marker = os.path.join(args.workdir, "data_ready")
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        generate_dataset(
            args.workdir, seed=99,
            chrom_lens={"chr1": int(args.genome_mb * 1e6)},
            n_variants=args.variants, samples=("S1", "S2", "S3"),
            depth=args.depth, read_len=150,
        )
        open(marker, "w").write("ok")
        print(f"[scale] dataset generated in {time.perf_counter()-t0:.1f}s")

    paths = {
        "ref": os.path.join(args.workdir, "ref.fa"),
        "vcf": os.path.join(args.workdir, "vars.vcf.gz"),
        "fq": os.path.join(args.workdir, "S1.fq.gz"),
    }

    from varigraph_tpu.config import VarigraphConfig
    from varigraph_tpu.index.build import construct_graph_index
    from varigraph_tpu.index.serialize import save_graph, load_graph
    from varigraph_tpu.genotype.engine_np import graph2node
    from varigraph_tpu.genotype.pipeline import genotype_one_sample

    gpath = os.path.join(args.workdir, "graph.vgt")
    t0 = time.perf_counter()
    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    gi = construct_graph_index(cfg)
    t_construct = time.perf_counter() - t0
    t0 = time.perf_counter()
    save_graph(gi, gpath)
    t_save = time.perf_counter() - t0
    print(f"[scale] construct: {t_construct:.1f}s  save: {t_save:.1f}s  "
          f"table={gi.table.size}")

    t0 = time.perf_counter()
    gi = load_graph(gpath)
    graph2node(gi)
    t_load = time.perf_counter() - t0
    gcfg = VarigraphConfig(kmer_len=gi.kmer_len, vcf_ploidy=gi.vcf_ploidy,
                           engine="jax", seed=0)
    t0 = time.perf_counter()
    ours_vcf = genotype_one_sample(gi, gcfg, "S1", [paths["fq"]],
                                   out_dir=os.path.join(args.workdir, "ours"))
    t_geno = time.perf_counter() - t0
    print(f"[scale] load+graph2node: {t_load:.1f}s  genotype: {t_geno:.1f}s")

    def gt_map(p):
        out = {}
        for line in gzip.open(p, "rt"):
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            out[(f[0], int(f[1]))] = sorted(f[9].split(":")[0].split("/"))
        return out

    ours = gt_map(ours_vcf)
    print(f"[scale] our calls: {len(ours)}")

    if not args.skip_ref:
        ref_bin = os.path.join(ROOT, ".ref_build", "varigraph")
        if os.path.exists(ref_bin):
            gb = os.path.join(args.workdir, "graph.bin")
            t0 = time.perf_counter()
            if not os.path.exists(gb):
                subprocess.run([ref_bin, "construct", "-r", paths["ref"],
                                "-v", paths["vcf"], "--save-graph", gb,
                                "-t", "2"], check=True, capture_output=True)
            t_ref_c = time.perf_counter() - t0
            cfgp = os.path.join(args.workdir, "s.cfg")
            open(cfgp, "w").write(f"S1 {paths['fq']}\n")
            t0 = time.perf_counter()
            subprocess.run([ref_bin, "genotype", "--load-graph", gb, "-s",
                            cfgp, "-t", "2"], check=True,
                           capture_output=True, cwd=args.workdir)
            t_ref_g = time.perf_counter() - t0
            ref = gt_map(os.path.join(args.workdir, "S1.varigraph.vcf.gz"))
            shared = set(ours) & set(ref)
            match = sum(1 for s in shared if ours[s] == ref[s])
            print(f"[scale] reference: construct {t_ref_c:.1f}s  "
                  f"genotype {t_ref_g:.1f}s  calls={len(ref)}")
            print(f"[scale] GT concordance vs reference binary: "
                  f"{match}/{len(shared)} = {match/max(len(shared),1):.4f}")
            print(f"[scale] site overlap: ours={len(ours)} ref={len(ref)} "
                  f"shared={len(shared)}")

    print(f"[scale] total: {time.perf_counter()-t_all:.1f}s")


if __name__ == "__main__":
    main()
