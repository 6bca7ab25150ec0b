"""TPU timing probe for the count-merge join variants.

The production hot path sorts [table ++ read-batch k-mers] per batch
(ops/table.py count_merge).  The flat concat sort sits right at the measured
fast-regime edge (~2.6M elements, CLAUDE.md); this probe times the flat join
against row-chunked variants (R independent smaller sorts batched in one
lax.sort call, each chunk carrying its own copy of the table) and a
scatter-free variant to isolate where the time goes.

Run ON TPU in one long-lived process (compiles through the axon tunnel cost
minutes per shape):  python tools/join_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from varigraph_tpu.ops.table import count_merge, count_merge_chunked

M = 262_144          # table size (bench-scale)
B, L = 16384, 160    # production read-batch shape
K = 27
ITERS = 30


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, 1 << 63, size=M, dtype=np.uint64) << np.uint64(8) | np.uint64(K))
    q = rng.integers(0, 1 << 63, size=B * L, dtype=np.uint64) << np.uint64(8) | np.uint64(K)
    # make ~10% of queries real hits
    hit = rng.random(B * L) < 0.10
    q[hit] = keys[rng.integers(0, M, size=int(hit.sum()))]
    mask = rng.random(B * L) < 0.95

    keys_d = jnp.asarray(keys)
    q_d = jnp.asarray(q)
    mask_d = jnp.asarray(mask)
    cov0 = jnp.zeros((M,), jnp.uint32)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def flat(cov):
        return count_merge(cov, keys_d, q_d, mask_d)

    def chunked(r):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def f(cov):
            return count_merge_chunked(cov, keys_d, q_d, mask_d, r)
        return f

    @jax.jit
    def flat_nocov():
        # same join, but reduce matches instead of scattering into cov
        from varigraph_tpu.ops.table import _SENTINEL, _U64
        m = keys_d.shape[0]
        qq = jnp.where(mask_d, q_d, _SENTINEL)
        tag = _U64(0x80)
        vals = jnp.concatenate([keys_d, qq | tag])
        vals_s = jax.lax.sort(vals)
        is_key = (vals_s & tag) == 0
        vals_s = vals_s & ~tag
        first = jnp.concatenate([jnp.ones((1,), jnp.bool_), vals_s[1:] != vals_s[:-1]])
        key_at_start = first & is_key
        seg_id = jnp.cumsum(first.astype(jnp.int32))
        latest = jax.lax.cummax(jnp.where(key_at_start, seg_id, 0))
        matched = (~is_key) & (latest == seg_id)
        return jnp.sum(matched.astype(jnp.int32))

    variants = [("flat", flat)] + [(f"chunk{r}", chunked(r)) for r in (4, 8, 16)]

    results = {}
    for name, fn in variants:
        t0 = time.perf_counter()
        cov = fn(jnp.zeros((M,), jnp.uint32))
        cov.block_until_ready()
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        expected = results.get("expected")
        got = int(np.asarray(jnp.minimum(cov, 255)).astype(np.int64).sum())
        if expected is None:
            results["expected"] = got
        else:
            assert got == expected, (name, got, expected)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            cov = fn(cov)
        cov.block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
        results[name] = dt
        print(f"{name}: {dt*1e3:.1f} ms/batch -> {B*L/dt/1e6:.0f}M kmers/s", file=sys.stderr)

    t0 = time.perf_counter()
    s = flat_nocov(); s.block_until_ready()
    print(f"flat_nocov: compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = flat_nocov()
    s.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    print(f"flat_nocov (no scatter): {dt*1e3:.1f} ms/batch", file=sys.stderr)
    print(results)


if __name__ == "__main__":
    main()
