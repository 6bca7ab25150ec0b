"""Measure axon-tunnel H2D bandwidth vs transfer size.

Informs the counting feed's upload layout: per-transfer overhead vs
streaming bandwidth (tools/e2e_probe.py showed H2D at ~50-70 MB/s is the
end-to-end counting bottleneck).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    print(f"backend: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    for mb in (1, 2.5, 10, 40, 157):
        n = int(mb * 1e6)
        arr = rng.integers(0, 5, size=n, dtype=np.uint8)
        # warm
        jax.device_put(arr[: 1024]).block_until_ready()
        for trial in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(arr)
            d.block_until_ready()
            dt = time.perf_counter() - t0
            print(f"h2d {mb:7.1f} MB [{trial}]: {dt*1e3:8.1f} ms  "
                  f"{n/1e6/dt:7.1f} MB/s", flush=True)
            del d


if __name__ == "__main__":
    main()
