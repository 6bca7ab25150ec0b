"""device_put latency vs payload size through the axon tunnel (2026-08-21).

count_probe8 showed feed+h2d at 678 ms/batch (2.6 MB groups) while the
full counting path ran 139.5 ms/batch -- uploads look latency-bound, not
bandwidth-bound.  This measures put+readback round trips for growing
payloads to decide the upload granularity (_FUSE) for large-table
counting.  Each size: 6 reps, random bytes (high entropy).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

rng = np.random.default_rng(0)
dev = jax.devices()[0]
print("device:", dev)

for mb in (0.65, 2.6, 10.4, 16.5, 41.6):
    n = int(mb * 1e6)
    bufs = [rng.integers(0, 256, n, dtype=np.uint8) for _ in range(6)]
    # warmup
    a = jax.device_put(bufs[0])
    np.asarray(jax.device_get(a[:1]))
    ts = []
    for b in bufs:
        t0 = time.time()
        a = jax.device_put(b)
        np.asarray(jax.device_get(a[:1]))  # real round-trip sync
        ts.append(time.time() - t0)
    ts = np.array(ts)
    print(f"{mb:6.2f} MB: median {np.median(ts)*1e3:7.1f} ms  "
          f"min {ts.min()*1e3:7.1f}  max {ts.max()*1e3:7.1f}  "
          f"-> {mb/np.median(ts):6.1f} MB/s", flush=True)

# concurrent puts: does a second thread help or serialize?
from concurrent.futures import ThreadPoolExecutor
n = int(2.6e6)
bufs = [rng.integers(0, 256, n, dtype=np.uint8) for _ in range(12)]
for workers in (1, 2, 4):
    pool = ThreadPoolExecutor(workers)
    t0 = time.time()
    arrs = list(pool.map(jax.device_put, bufs))
    for a in arrs[-workers:]:
        np.asarray(jax.device_get(a[:1]))
    dt = time.time() - t0
    print(f"12x 2.6MB, {workers} workers: {dt*1e3:7.1f} ms total "
          f"({dt/12*1e3:6.1f} ms/put)", flush=True)
