"""Probe 5: Pallas banded join vs the two-sort join at bench shapes.

Run ON TPU with the chip otherwise idle: python tools/join_probe5.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from varigraph_tpu.ops.join_pallas import count_merge_banded
from varigraph_tpu.ops.table import count_merge

M = 103_721
B, L = 16384, 160
K = 27
ITERS = 30


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    keys = np.unique(
        (rng.integers(0, 1 << 55, size=M, dtype=np.uint64) << np.uint64(8))
        | np.uint64(K)
    )
    m = len(keys)
    q = (rng.integers(0, 1 << 55, size=B * L, dtype=np.uint64) << np.uint64(8)) | np.uint64(K)
    hit = rng.random(B * L) < 0.10
    q[hit] = keys[rng.integers(0, m, size=int(hit.sum()))]
    mask = rng.random(B * L) < 0.95
    keys_d = jnp.asarray(keys)
    q_d = jax.device_put(jnp.asarray(q))
    mask_d = jax.device_put(jnp.asarray(mask))

    import collections
    ctr = collections.Counter(q[mask].tolist())
    expect = np.array([ctr.get(int(kk), 0) for kk in keys], np.uint32)

    for name, fn in [
        ("banded", count_merge_banded),
        ("twosort", count_merge),
    ]:
        jf = jax.jit(fn, donate_argnums=(0,))
        t0 = time.perf_counter()
        cov = jf(jnp.zeros((m,), jnp.uint32), keys_d, q_d, mask_d)
        cov.block_until_ready()
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        got = np.asarray(cov)
        assert (got == expect).all(), (
            name, np.flatnonzero(got != expect)[:5],
        )
        t0 = time.perf_counter()
        for _ in range(ITERS):
            cov = jf(cov, keys_d, q_d, mask_d)
        cov.block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}: {dt*1e3:.2f} ms/batch -> {B*L/dt/1e6:.0f}M kmers/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
