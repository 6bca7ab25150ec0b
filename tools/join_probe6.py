"""Probe 6: Pallas banded join block-size sweep at bench shapes.

The bench ratio (~25 queries per key) overflows the old 2x2048 band, so
probe5 measured mostly the lax.cond fallback.  This sweeps (TABLE_BLOCK,
QBAND) configs whose two-tile band covers the mean band Q*TB/M with
skew margin.  Run ON TPU with the chip otherwise idle:
  python tools/join_probe6.py
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

CONFIGS = [(128, 4096), (64, 2048)]


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

    # host-side check: would the band fit (i.e. is the banded path actually
    # exercised, not the fallback)?
    qs = np.sort(np.where(mask, q, np.uint64(0xFFFFFFFFFFFFFFFF)))
    for tb, qband in CONFIGS:
        mb = (m + tb - 1) // tb
        lo = np.searchsorted(qs, keys[::tb])
        hi = np.searchsorted(
            np.concatenate([keys, [np.uint64(0xFFFFFFFFFFFFFFFF)]])[tb::tb],
            qs, side="right",
        )
        # per-block band = queries in [blockmin, blockmax]
        ends = np.searchsorted(qs, np.concatenate(
            [keys[tb - 1 :: tb], keys[-1:]])[:mb], side="right")
        band = ends - lo[:mb]
        t0 = lo[:mb] // qband
        t1 = np.maximum(ends - 1, 0) // qband
        frac = float(np.mean(t1 <= t0 + 1))
        print(f"cfg tb={tb} qband={qband}: mean band {band.mean():.0f} "
              f"max {band.max()} fits2tiles {frac:.4f}", file=sys.stderr)

    for name, fn in [
        (f"banded{tb}x{qband}",
         functools.partial(count_merge_banded, tb=tb, qband=qband))
        for tb, qband in CONFIGS
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
