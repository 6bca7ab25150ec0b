"""H2D probe 2: distinct fresh arrays, the exact e2e upload pattern.

h2d_probe.py showed repeat uploads of the SAME array at ~1.2 GB/s (possible
tunnel content-dedup) while e2e_probe.py measured 15 distinct 10.5 MB stacks
at 50-70 MB/s.  Isolate: per-upload time for DISTINCT 10.5 MB uint8 arrays,
sequential, no compute in flight.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    print(f"backend: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(1)
    shape = (4, 16384, 160)  # the production fused stack: 10.5 MB
    arrs = [rng.integers(0, 5, size=shape, dtype=np.uint8) for _ in range(15)]
    nbytes = arrs[0].nbytes
    jax.device_put(arrs[0][:1, :16]).block_until_ready()  # warm link

    for rep in range(2):
        devs = []
        t_all = time.perf_counter()
        for i, a in enumerate(arrs):
            t0 = time.perf_counter()
            d = jax.device_put(a)
            d.block_until_ready()
            dt = time.perf_counter() - t0
            devs.append(d)
            print(f"rep{rep} stack{i:2d}: {dt*1e3:7.1f} ms  "
                  f"{nbytes/1e6/dt:7.1f} MB/s", flush=True)
        dt_all = time.perf_counter() - t_all
        print(f"rep{rep} TOTAL: {dt_all:.3f}s  "
              f"{len(arrs)*nbytes/1e6/dt_all:.1f} MB/s", flush=True)
        del devs

    # low-entropy variant: does content compressibility matter? (real read
    # codes are 0..4, mostly repetitive); reuse one buffer, vary a slice
    base = np.zeros(shape, np.uint8)
    for i in range(4):
        base[0, i, :] = i  # make each "distinct"
        t0 = time.perf_counter()
        d = jax.device_put(base.copy())
        d.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"zeros-ish {i}: {dt*1e3:7.1f} ms  {nbytes/1e6/dt:7.1f} MB/s",
              flush=True)
        del d


if __name__ == "__main__":
    main()
