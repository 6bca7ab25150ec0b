"""Break down the end-to-end counting path into feed / H2D / device phases.

Answers: why is e2e (45.9M kmers/s @ BENCH r3-pre) 4x slower than the
pure-device loop (192.5M/s)?  Times, on the real bench dataset:
  1. feed-only: stream_read_batches_multi -> discard (host gz + packing)
  2. H2D-only:  device_put of the fused [F,B,L] stacks, blocked
  3. H2D pipelined: device_put on a depth-3 thread pool (as count_reads does)
  4. device-only: _count_fused over pre-staged stacks (bench's device loop)
  5. e2e: count_reads (the production path)

Run on TPU (one process at a time):  python tools/e2e_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import K, REPEATS, count_total_kmers, ensure_dataset


def main():
    import jax
    import jax.numpy as jnp

    from varigraph_tpu.genotype.counting import _FUSE, _count_fused, count_reads
    from varigraph_tpu.index.serialize import load_graph
    from varigraph_tpu.io.fastq import stream_read_batches_multi

    paths = ensure_dataset()
    gi = load_graph(paths["graph"])
    print(f"backend: {jax.devices()[0]}; table {gi.table.size}", flush=True)
    batch_size, max_len = 16384, 160
    files = paths["fqs"] * REPEATS
    kmers = count_total_kmers(paths["fqs"]) * REPEATS
    print(f"{kmers/1e6:.1f}M kmers/trial", flush=True)

    # ---- 1. feed-only ------------------------------------------------------
    for trial in range(2):
        t0 = time.perf_counter()
        nb, bases = 0, 0
        for codes, b in stream_read_batches_multi(files, batch_size, max_len, K):
            nb += 1
            bases += b
        dt = time.perf_counter() - t0
        print(f"feed-only[{trial}]: {dt:.3f}s  {nb} batches  "
              f"{bases/1e6/dt:.1f}M bases/s  -> {kmers/dt/1e6:.1f}M kmers/s cap",
              flush=True)

    # collect stacks once for H2D / device probes
    stacks = []
    group = []
    for codes, b in stream_read_batches_multi(files, batch_size, max_len, K):
        group.append(codes)
        if len(group) == _FUSE:
            stacks.append(np.stack(group))
            group = []
    if group:
        pad = np.full_like(group[0], 4)
        while len(group) < _FUSE:
            group.append(pad)
        stacks.append(np.stack(group))
    nbytes = sum(s.nbytes for s in stacks)
    print(f"{len(stacks)} fused stacks, {nbytes/1e6:.1f} MB total", flush=True)

    # ---- 2. H2D serial -----------------------------------------------------
    for trial in range(2):
        t0 = time.perf_counter()
        devs = [jax.device_put(s) for s in stacks]
        for d in devs:
            d.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"h2d-serial[{trial}]: {dt:.3f}s  {nbytes/1e6/dt:.1f} MB/s  "
              f"{dt/len(stacks)*1e3:.1f} ms/stack -> {kmers/dt/1e6:.1f}M kmers/s cap",
              flush=True)
        del devs

    # ---- 3. H2D pipelined (thread pool depth 3) ----------------------------
    from concurrent.futures import ThreadPoolExecutor
    for trial in range(2):
        pool = ThreadPoolExecutor(max_workers=3)
        t0 = time.perf_counter()
        futs = [pool.submit(jax.device_put, s) for s in stacks]
        devs = [f.result() for f in futs]
        for d in devs:
            d.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"h2d-pool3[{trial}]: {dt:.3f}s  {nbytes/1e6/dt:.1f} MB/s "
              f"-> {kmers/dt/1e6:.1f}M kmers/s cap", flush=True)
        pool.shutdown(wait=False)
        del devs

    # ---- 4. device-only ----------------------------------------------------
    keys = gi.table.keys
    dev_stacks = [jax.device_put(jnp.asarray(s)) for s in stacks]
    cov = jnp.zeros_like(gi.table.cov)
    cov = _count_fused(cov, keys, dev_stacks[0], K)  # warmup/compile
    cov.block_until_ready()
    for trial in range(3):
        cov = jnp.zeros_like(gi.table.cov).at[trial].add(np.uint32(trial + 1))
        t0 = time.perf_counter()
        for s in dev_stacks:
            cov = _count_fused(cov, keys, s, K)
        cov.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"device-only[{trial}]: {dt:.3f}s -> {kmers/dt/1e6:.1f}M kmers/s "
              f"(sum {int(cov.sum())})", flush=True)
    del dev_stacks

    # ---- 5. e2e (production path) ------------------------------------------
    for trial in range(3):
        gi.table.reset_cov()
        gi.table.cov = gi.table.cov.at[trial].add(np.uint32(trial + 1))
        t0 = time.perf_counter()
        count_reads(gi.table, files, K, batch_size, max_len)
        gi.table.cov.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"e2e[{trial}]: {dt:.3f}s -> {kmers/dt/1e6:.1f}M kmers/s "
              f"(sum {int(gi.table.cov.sum())})", flush=True)


if __name__ == "__main__":
    main()
