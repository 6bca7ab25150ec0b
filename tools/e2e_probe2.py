"""E2E counting sweep over feed knobs (_FUSE, _UPLOAD_DEPTH) in ONE process.

The packed feed (2-bit wire rows) made H2D bytes cheap; what remains per
fused group is a fixed tunnel dispatch/upload overhead.  This probe runs
the production count_reads with different fuse factors to find the knee.
Transient tunnel errors (the axon link occasionally returns
InvalidArgument) are caught and the trial retried once.

Usage: python tools/e2e_probe2.py   (TPU; ~minutes of one-time compiles)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

from bench import K, REPEATS, count_total_kmers, ensure_dataset  # noqa: E402


def main():
    paths = ensure_dataset()
    from varigraph_tpu.genotype import counting
    from varigraph_tpu.index.serialize import load_graph
    from varigraph_tpu.utils import log as logmod

    logmod.set_quiet(True) if hasattr(logmod, "set_quiet") else None
    gi = load_graph(paths["graph"])
    files = paths["fqs"] * REPEATS
    total_kmers = count_total_kmers(paths["fqs"]) * REPEATS
    batch_size, max_len = 16384, 152

    configs = [(f, d) for f in (4, 8, 16) for d in (3, 5)]
    for fuse, depth in configs:
        counting._FUSE = fuse
        counting._UPLOAD_DEPTH = depth
        trial = 0
        fails = 0
        while trial < 4 and fails < 3:
            gi.table.reset_cov()
            t0 = time.perf_counter()
            try:
                counting.count_reads(gi.table, files, K, batch_size, max_len)
                gi.table.cov.block_until_ready()
            except Exception as e:
                fails += 1
                print(f"FUSE={fuse} depth={depth}: tunnel error "
                      f"({type(e).__name__}), retrying", flush=True)
                continue
            dt = time.perf_counter() - t0
            hits = int(gi.table.cov.sum())
            tag = "compile" if trial == 0 and dt > 5 else f"{total_kmers/dt/1e6:.1f}M kmers/s"
            print(f"FUSE={fuse} depth={depth} trial={trial}: {dt:.3f}s -> "
                  f"{tag} (hits {hits})", flush=True)
            trial += 1


if __name__ == "__main__":
    main()
