"""Measure the superbatch join (large-table counting) on the real TPU.

Times the production large-table dispatch (_count_packed_super from
genotype/counting; originally the _sketch_to_rows + _join_rows pair) at
table sizes spanning the banded join's regime up to
the 1 Gbp rehearsal's 29M keys, and the banded join where it can compile,
to locate the crossover for _BANDED_MAX_KEYS.

Run ONE at a time (concurrent TPU processes serialize through the tunnel).
  python tools/join_probe7.py [Mkeys_list]   e.g. 0.1,1,4,29
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import varigraph_tpu.genotype.counting as C
from varigraph_tpu.ops.kmer import pack_codes_np

K = 27
B, L = 16384, 160
SUPER = C._SUPER_ROWS

m_list = [float(x) * 1e6 for x in
          (sys.argv[1] if len(sys.argv) > 1 else "0.1,1,4,16,29").split(",")]

rng = np.random.default_rng(0)

# one packed super-group [SUPER, B, L/4+2] reused for all dispatches
codes = rng.integers(0, 4, (SUPER, B, L), dtype=np.uint8)
lens = np.full(B, L, np.int64)
packed = np.stack([pack_codes_np(c, lens) for c in codes])
dev_packed = jax.device_put(packed)
nq = B * (L - K + 1)

print(f"nq per batch {nq/1e6:.2f}M, super rows {SUPER}")

for m_f in m_list:
    m = int(m_f)
    keys = np.unique(
        (rng.integers(0, 1 << 55, size=m, dtype=np.uint64) << np.uint64(8))
        | np.uint64(K))
    dkeys = jnp.asarray(keys)
    cov = jnp.zeros((len(keys),), jnp.uint32)

    # warm up compiles (block via a real D2H fetch: block_until_ready
    # returns early for tunnel-remote arrays)
    cov = C._count_packed_super(cov, dkeys, dev_packed, K)
    _ = np.asarray(cov[:8])

    # steady state: one fused sketch+join dispatch per SUPER batches
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        cov = C._count_packed_super(cov, dkeys, dev_packed, K)
    _ = np.asarray(cov[:8])
    dt = (time.time() - t0) / reps
    per_batch = dt / SUPER
    rate = nq / per_batch
    print(f"M={len(keys)/1e6:6.1f}M  super={dt*1e3:8.1f} ms "
          f"({per_batch*1e3:6.2f} ms/batch, {rate/1e6:6.0f}M kmers/s)",
          flush=True)

    # banded per-batch path for comparison (skip where it can't compile)
    if len(keys) <= 8e6:
        try:
            covb = jnp.zeros((len(keys),), jnp.uint32)
            covb = C._count_fused(covb, dkeys, dev_packed, K)
            _ = np.asarray(covb[:8])
            t0 = time.time()
            for _ in range(3 * max(1, SUPER // C._FUSE)):
                covb = C._count_fused(covb, dkeys, dev_packed, K)
            _ = np.asarray(covb[:8])
            n = 3 * max(1, SUPER // C._FUSE) * C._FUSE
            dtb = (time.time() - t0) / n
            print(f"          banded/fused path: {dtb*1e3:6.2f} ms/batch, "
                  f"{nq/dtb/1e6:6.0f}M kmers/s", flush=True)
        except Exception as e:
            print(f"          banded path failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
