"""Break down large-table end-to-end counting cost on the real TPU.

The round-4 1 Gbp rehearsal measured counting at 672 s for 4,070 batches
(165 ms/batch) while the pure device join runs 43.6 ms/batch
(join_probe7).  This probe isolates the layers on the SAME data:

  feed      iterate fused packed groups only (gz -> native reader -> pack)
  feed+h2d  feed + device_put uploads (no compute)
  full      production count_reads

Usage: python tools/count_probe8.py /tmp/vg_1g [n_files]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

data = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vg_1g"
n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 2

import glob

import jax

import varigraph_tpu.genotype.counting as C
from varigraph_tpu.io.fastq import stream_packed_batches_multi

fqs = sorted(glob.glob(f"{data}/S1_*.fq.gz"))[:n_files]
K = 27
B, L = 16384, 160

# ---- feed only ----
t0 = time.time()
nb = 0
gb = 0
for stacked, g, n_real in C._fused_groups(
    stream_packed_batches_multi(fqs, B, L, K, max_parallel=2), C._FUSE
):
    nb += n_real
    gb += g
dt = time.time() - t0
print(f"feed only:  {dt:7.1f}s  {nb} batches  {gb/1e9:.2f} Gb  "
      f"({dt/nb*1e3:.1f} ms/batch)", flush=True)

# ---- feed + H2D ----
t0 = time.time()
nb = 0
from concurrent.futures import ThreadPoolExecutor
import collections
pool = ThreadPoolExecutor(max_workers=C._UPLOAD_DEPTH)
inflight = collections.deque()
last = None
for stacked, g, n_real in C._fused_groups(
    stream_packed_batches_multi(fqs, B, L, K, max_parallel=2), C._FUSE
):
    inflight.append(pool.submit(jax.device_put, stacked))
    nb += n_real
    if len(inflight) >= C._UPLOAD_DEPTH:
        last = inflight.popleft().result()
while inflight:
    last = inflight.popleft().result()
np.asarray(jax.device_get(last[0, 0, :4]))
dt = time.time() - t0
print(f"feed + h2d: {dt:7.1f}s  {nb} batches  ({dt/nb*1e3:.1f} ms/batch)",
      flush=True)

# ---- full production path ----
from varigraph_tpu.index.serialize import load_graph

gi = load_graph(f"{data}/graph.vgt")
print(f"table {gi.table.size/1e6:.1f}M keys", flush=True)
t0 = time.time()
C.count_reads(gi.table, fqs, K, B, L, io_threads=2)
dt = time.time() - t0
print(f"full count: {dt:7.1f}s  ({dt/nb*1e3:.1f} ms/batch, "
      f"{gb/dt/1e6:.1f}M kmers/s-ish)", flush=True)
