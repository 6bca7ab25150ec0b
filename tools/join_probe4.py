"""Probe 4: true cost split of the two sorts inside count_merge.

probe1's flat_nocov (2.4 ms) closed over the query arrays, which lets XLA
treat them as constants and pre-fold work; here every stage takes its
inputs as arguments.  Stages:

  sort1        lax.sort of [keys ++ tagged queries]     (join sort)
  sort1_scans  sort1 + the matched/run_idx scan block
  full         count_merge (adds the second sort + elementwise add)

Run ON TPU with the chip otherwise idle: python tools/join_probe4.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from varigraph_tpu.ops.table import _SENTINEL, _U64, count_merge

M = 103_721
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
    q = (rng.integers(0, 1 << 55, size=B * L, dtype=np.uint64) << np.uint64(8)) | np.uint64(K)
    mask = rng.random(B * L) < 0.95
    keys_d = jnp.asarray(keys)
    q_d = jax.device_put(jnp.asarray(q))
    mask_d = jax.device_put(jnp.asarray(mask))

    @jax.jit
    def sort1(keys, queries, mask):
        qq = jnp.where(mask, queries, _SENTINEL)
        vals = jnp.concatenate([keys, qq | _U64(0x80)])
        return jax.lax.sort(vals)

    @jax.jit
    def sort1_scans(keys, queries, mask):
        qq = jnp.where(mask, queries, _SENTINEL)
        tag = _U64(0x80)
        vals = jnp.concatenate([keys, qq | tag])
        vals_s = jax.lax.sort(vals)
        is_key = (vals_s & tag) == 0
        vals_c = vals_s & ~tag
        first = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), vals_c[1:] != vals_c[:-1]]
        )
        key_at_start = first & is_key
        seg_id = jnp.cumsum(first.astype(jnp.int32))
        latest = jax.lax.cummax(jnp.where(key_at_start, seg_id, 0))
        matched = (~is_key) & (latest == seg_id)
        run_idx = jnp.cumsum(is_key.astype(jnp.int32)) - 1
        cm = jnp.cumsum(matched.astype(jnp.int32))
        # consume everything so nothing is dead
        return cm[-1] + run_idx[-1] + jnp.sum(matched.astype(jnp.int32))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def full(cov, keys, queries, mask):
        return count_merge(cov, keys, queries, mask)

    def bench(name, fn, *args, donate_first=None):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            if donate_first is not None:
                out = fn(out, *args[1:])
            else:
                out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}: {dt*1e3:.2f} ms/batch", file=sys.stderr)

    bench("sort1", sort1, keys_d, q_d, mask_d)
    bench("sort1_scans", sort1_scans, keys_d, q_d, mask_d)
    bench("full", full, jnp.zeros((M,), jnp.uint32), keys_d, q_d, mask_d,
          donate_first=True)


if __name__ == "__main__":
    main()
