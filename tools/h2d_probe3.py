"""H2D probe 3: REAL read-code batches, unpacked vs 2-bit packed.

h2d_probe2.py showed the tunnel uploads high-entropy bytes at ~1 GB/s but
low-entropy bytes at ~40 MB/s (client-side compression/dedup cost).  Read
code batches (values 0..4) are low-entropy per byte; 2-bit packing is 4x
fewer bytes at ~full entropy.  Measure both on the real bench reads.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import K, ensure_dataset


def pack2(codes: np.ndarray) -> np.ndarray:
    """[.., L] codes 0..4 -> [.., L/4] u8, 2 bits/base (4 -> 0, masked later)."""
    c = np.where(codes > 3, 0, codes).astype(np.uint8)
    c = c.reshape(*codes.shape[:-1], -1, 4)
    return (c[..., 0] | (c[..., 1] << 2) | (c[..., 2] << 4)
            | (c[..., 3] << 6)).astype(np.uint8)


def main():
    import jax

    from varigraph_tpu.io.fastq import stream_read_batches_multi

    paths = ensure_dataset()
    print(f"backend: {jax.devices()[0]}", flush=True)
    batch_size, max_len = 16384, 160

    stacks = []
    group = []
    for codes, b in stream_read_batches_multi(paths["fqs"], batch_size,
                                              max_len, K):
        group.append(codes)
        if len(group) == 4:
            stacks.append(np.stack(group))
            group = []
        if len(stacks) == 15:
            break
    packed = [pack2(s) for s in stacks]
    lens = [(s != 4).sum(axis=-1).astype(np.int32) for s in stacks]
    jax.device_put(packed[0][:1, :16]).block_until_ready()

    for name, arrs in (("unpacked-u8", stacks), ("packed-2bit", packed)):
        nbytes = arrs[0].nbytes
        for rep in range(2):
            t_all = time.perf_counter()
            devs = [jax.device_put(a) for a in arrs]
            for d in devs:
                d.block_until_ready()
            dt = time.perf_counter() - t_all
            print(f"{name} rep{rep}: {dt:.3f}s total "
                  f"({len(arrs)}x{nbytes/1e6:.1f} MB)  "
                  f"{len(arrs)*nbytes/1e6/dt:.1f} MB/s", flush=True)
            del devs

    # lengths are tiny; confirm they're negligible
    t0 = time.perf_counter()
    dl = [jax.device_put(l) for l in lens]
    for d in dl:
        d.block_until_ready()
    print(f"lens upload: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
