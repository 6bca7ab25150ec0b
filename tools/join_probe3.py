"""Probe 3: split the per-batch counting cost into sketch vs join.

bench.py measures 17.8 ms per [16384, 160] batch for the fused
sketch+count_merge step against a 103k-key table, while join_probe2
measured the join alone at 9.1 ms (262k keys).  Time sketch_codes and
count_merge separately at bench shapes, plus the fused step.

Run ON TPU: python tools/join_probe3.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from varigraph_tpu.ops.kmer import sketch_codes
from varigraph_tpu.ops.table import count_merge

M = 103_721  # bench table size (non-pow2 on purpose)
B, L = 16384, 160
K = 27
ITERS = 30


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    keys = np.sort(
        (rng.integers(0, 1 << 55, size=M, dtype=np.uint64) << np.uint64(8))
        | np.uint64(K)
    )
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    codes_d = jax.device_put(jnp.asarray(codes))
    keys_d = jnp.asarray(keys)

    sk = jax.jit(functools.partial(sketch_codes, k=K))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def join_only(cov, q, msk):
        return count_merge(cov, keys_d, q, msk)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fused(cov, codes):
        v, e = sketch_codes(codes, K)
        return count_merge(cov, keys_d, v.reshape(-1), e.reshape(-1))

    # sketch alone
    t0 = time.perf_counter()
    v, e = sk(codes_d)
    v.block_until_ready()
    print(f"sketch: compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        v, e = sk(codes_d)
    v.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    print(f"sketch: {dt*1e3:.2f} ms/batch", file=sys.stderr)

    q = v.reshape(-1)
    msk = e.reshape(-1)

    # join alone
    t0 = time.perf_counter()
    cov = join_only(jnp.zeros((M,), jnp.uint32), q, msk)
    cov.block_until_ready()
    print(f"join: compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        cov = join_only(cov, q, msk)
    cov.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    print(f"join: {dt*1e3:.2f} ms/batch", file=sys.stderr)

    # fused (production step shape)
    t0 = time.perf_counter()
    cov2 = fused(jnp.zeros((M,), jnp.uint32), codes_d)
    cov2.block_until_ready()
    print(f"fused: compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        cov2 = fused(cov2, codes_d)
    cov2.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    print(f"fused: {dt*1e3:.2f} ms/batch -> {B*(L-K+1)/dt/1e6:.0f}M kmers/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
