"""Probe 2: scatter-free count-merge variants.

join_probe.py showed the flat sort+scan join costs ~2.4 ms/batch while the
trailing scatter-add costs ~17 ms.  Two scatter-free alternatives:

  twosort        compact per-key matched counts into table order with a
                 second u64 sort (packed (run_idx<<32 | cumsum)), then a
                 plain elementwise cov + counts.
  sorted_scatter same scatter but with run_idx everywhere (nondecreasing)
                 and indices_are_sorted=True.

Run ON TPU: python tools/join_probe2.py
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

M = 262_144
B, L = 16384, 160
K = 27
ITERS = 30


def _join_core(keys, queries, mask):
    m = keys.shape[0]
    q = jnp.where(mask, queries, _SENTINEL)
    tag_bit = _U64(0x80)
    vals = jnp.concatenate([keys, q | tag_bit])
    vals_s = jax.lax.sort(vals)
    is_key = (vals_s & tag_bit) == 0
    vals_c = vals_s & ~tag_bit
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), vals_c[1:] != vals_c[:-1]]
    )
    key_at_start = first & is_key
    seg_id = jnp.cumsum(first.astype(jnp.int32))
    latest = jax.lax.cummax(jnp.where(key_at_start, seg_id, 0))
    matched = (~is_key) & (latest == seg_id)
    run_idx = jnp.cumsum(is_key.astype(jnp.int32)) - 1
    return is_key, matched, run_idx


def count_merge_twosort(cov, keys, queries, mask):
    m = keys.shape[0]
    is_key, matched, run_idx = _join_core(keys, queries, mask)
    cm = jnp.cumsum(matched.astype(jnp.int32))          # inclusive
    packed = (
        jnp.where(is_key, run_idx, jnp.int32(0x7FFFFFFF)).astype(_U64)
        << _U64(32)
    ) | cm.astype(_U64)
    packed_s = jax.lax.sort(packed)
    cmk = (packed_s[:m] & _U64(0xFFFFFFFF)).astype(jnp.uint32)
    total = cm[-1].astype(jnp.uint32)
    nxt = jnp.concatenate([cmk[1:], total[None]])
    return cov + (nxt - cmk)


def count_merge_sorted_scatter(cov, keys, queries, mask):
    is_key, matched, run_idx = _join_core(keys, queries, mask)
    idx = jnp.maximum(run_idx, 0)
    return cov.at[idx].add(
        matched.astype(jnp.uint32),
        indices_are_sorted=True,
        mode="promise_in_bounds",
    )


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, 1 << 63, size=M, dtype=np.uint64) << np.uint64(8) | np.uint64(K))
    q = rng.integers(0, 1 << 63, size=B * L, dtype=np.uint64) << np.uint64(8) | np.uint64(K)
    hit = rng.random(B * L) < 0.10
    q[hit] = keys[rng.integers(0, M, size=int(hit.sum()))]
    mask = rng.random(B * L) < 0.95

    keys_d = jnp.asarray(keys)
    q_d = jnp.asarray(q)
    mask_d = jnp.asarray(mask)

    # correctness oracle via numpy
    qm = q[mask]
    import collections
    ctr = collections.Counter(qm.tolist())
    expect = np.array([ctr.get(int(kk), 0) for kk in keys], np.uint32)

    variants = [
        ("twosort", count_merge_twosort),
        ("sorted_scatter", count_merge_sorted_scatter),
    ]
    for name, fn in variants:
        jf = jax.jit(functools.partial(fn, keys=keys_d, queries=q_d, mask=mask_d),
                     donate_argnums=(0,))
        t0 = time.perf_counter()
        cov = jf(jnp.zeros((M,), jnp.uint32))
        cov.block_until_ready()
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        got = np.asarray(cov)
        assert (got == expect).all(), (name, np.flatnonzero(got != expect)[:5])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            cov = jf(cov)
        cov.block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}: {dt*1e3:.2f} ms/batch -> {B*L/dt/1e6:.0f}M kmers/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
