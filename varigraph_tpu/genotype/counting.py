"""Read k-mer counting against the graph table, batched on device.

Replaces the reference's thread-pooled per-read hash-map probing
(src/fastq_kmer.cpp:65-187, kmer_sketch_fastq at src/kmer.cpp:110-149) with:
  FASTQ stream -> packed [B, L] base-code batches -> device sketch scan ->
  banded merge join against the sorted table -> compacted coverage add.

Host->device feed design (the end-to-end bottleneck): read batches travel
in the 2-bit PACKED wire format ([B, L/4+2] rows: 4 bases/byte + u16 valid
length, ops/kmer.unpack_2bit) -- 4x fewer H2D bytes at ~full entropy, which
matters doubly through the axon tunnel (its client compresses low-entropy
buffers at ~40 MB/s but ships high-entropy ones at ~1 GB/s,
tools/h2d_probe2.py).  Batches are additionally FUSED -- ``_FUSE`` host
batches stack into one [F, B, L/4+2] upload, and one jitted ``lax.scan``
dispatch joins all F sub-batches.  Uploads run on a small thread pool
(depth ``_UPLOAD_DEPTH``) so H2D copies overlap both the gz/packing feed
and device compute.
"""

from __future__ import annotations

import collections
import functools
import os
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from ..io.fastq import stream_packed_batches_multi
from ..ops.kmer import sketch_packed
from ..ops.table import _SENTINEL, KmerTable, count_merge, count_merge_super
from ..utils.log import log


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _count_batch_inner(cov: jnp.ndarray, keys: jnp.ndarray,
                       packed: jnp.ndarray, k: int):
    values, emit = sketch_packed(packed, k)
    # positions 0..k-2 of every row can never emit (the rolling window is
    # incomplete); dropping them statically cuts the join's query slots by
    # (k-1)/L (~16% at k=27, L=160) -- the query sort is the kernel's
    # dominant cost (ops/join_pallas.py)
    values, emit = values[..., k - 1 :], emit[..., k - 1 :]
    q, em = values.reshape(-1), emit.reshape(-1)
    if _on_tpu():
        # Pallas banded merge-join: 7.7 ms/batch vs 16.9 ms for the two-sort
        # join at bench shapes (v5e, tools/join_probe6.py); falls back to the
        # two-sort join inside jit when a query band overflows its two tiles
        # (e.g. one k-mer repeated >4k times in a batch)
        from ..ops.join_pallas import count_merge_banded

        return count_merge_banded(cov, keys, q, em)
    return count_merge(cov, keys, q, em)


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(0,))
def _count_batch(cov: jnp.ndarray, keys: jnp.ndarray, packed: jnp.ndarray,
                 k: int):
    return _count_batch_inner(cov, keys, packed, k)


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(0,))
def _count_fused(cov: jnp.ndarray, keys: jnp.ndarray, packed_f: jnp.ndarray,
                 k: int):
    """Join F stacked packed batches ([F, B, L/4+2]) in one lax.scan dispatch."""

    def body(c, packed):
        return _count_batch_inner(c, keys, packed, k), None

    cov, _ = jax.lax.scan(body, cov, packed_f)
    return cov


_N_ACCUMULATORS = 3  # round-robin coverage buffers so group n+1's join can
                     # start while group n's is still in flight
_FUSE = 4            # host batches stacked per H2D upload / device dispatch
_UPLOAD_DEPTH = 3    # uploads in flight ahead of the consumer

# ---- large-table regime -------------------------------------------------
# Above this many table keys the per-batch joins stop making sense: the
# Pallas banded join's M/128-block grid wanted 41.9 GB of HBM to compile at
# a 29M-key table (round-3 1 Gbp rehearsal) and hits a TPU backend error at
# 4M keys (tools/join_probe7.py), and the two-sort join pays the full M-key
# concat+sort every batch.  The superbatch path instead stashes sketched
# queries in an HBM buffer and joins once per _SUPER_ROWS sub-batches
# (ops/table.count_merge_super), amortizing the table term.  Measured on
# v5e (join_probe7): banded 17.9 ms/batch at 1M keys; superbatch ~26 ms
# flat at 1-4M and 43.6 ms at 29M (50M k-mers/s device-side).
_BANDED_MAX_KEYS = int(os.environ.get("VARIGRAPH_BANDED_MAX_KEYS",
                                      str(2 << 20)))
_SUPER_ROWS = 24     # sub-batches per super-join; must be a multiple of _FUSE

# Pace async dispatch with a real 4-byte D2H fetch every this many fused
# groups (and after every super-join).  Through the axon tunnel
# block_until_ready() returns early, so without a real fetch the client
# enqueues thousands of dispatches ahead of execution -- the round-4 1 Gbp
# rehearsal (4,070 batches in ~155 s of enqueue) lost its tunnel session
# mid-backlog and hung forever on the next fetch.  One small fetch per
# ~window keeps the client within a bounded lead at ~50 ms per sync.
_PACE_GROUPS = 8


def _pace(arr) -> None:
    np.asarray(jax.device_get(arr[:1]))


_I32_CACHE: dict[int, object] = {}


def _i32(v: int):
    """Memoized tiny device scalar: every fresh jnp.int32(x) is its own
    H2D transfer, which through the high-latency tunnel adds up over
    thousands of dispatch calls."""
    c = _I32_CACHE.get(v)
    if c is None:
        c = _I32_CACHE[v] = jnp.int32(v)
    return c


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(0,))
def _sketch_to_rows(buf: jnp.ndarray, packed_f: jnp.ndarray,
                    slot0: jnp.ndarray, k: int) -> jnp.ndarray:
    """Sketch F stacked packed sub-batches and stash their sentinelized flat
    values into buf rows [slot0, slot0+F).  Pad sub-batches (valid length 0)
    produce all-sentinel rows, so tail groups stay correct."""

    def body(carry, packed):
        b, slot = carry
        values, emit = sketch_packed(packed, k)
        values, emit = values[..., k - 1:], emit[..., k - 1:]
        row = jnp.where(emit, values, _SENTINEL).reshape(-1)
        b = jax.lax.dynamic_update_slice(b, row[None], (slot, jnp.int32(0)))
        return (b, slot + 1), None

    (buf, _), _ = jax.lax.scan(body, (buf, jnp.int32(slot0)), packed_f)
    return buf


@functools.partial(jax.jit, donate_argnums=(0,))
def _join_rows(cov: jnp.ndarray, keys: jnp.ndarray, buf: jnp.ndarray,
               nrows: jnp.ndarray) -> jnp.ndarray:
    """Join buf rows [0, nrows) against the table (rows beyond nrows are
    stale from the previous super-group and masked out)."""
    valid = jnp.arange(buf.shape[0], dtype=jnp.int32) < nrows
    vals = jnp.where(valid[:, None], buf, _SENTINEL).reshape(-1)
    return count_merge_super(cov, keys, vals)


def _fused_groups(batch_iter, fuse: int):
    """Stack ``fuse`` packed host batches into [F, B, L/4+2]; the tail group
    is padded with zero rows (valid length 0 -> no emissions) so every
    dispatch has one static shape."""
    group, gb = [], 0
    for packed, bases in batch_iter:
        group.append(packed)
        gb += bases
        if len(group) == fuse:
            yield np.stack(group), gb, fuse
            group, gb = [], 0
    if group:
        n_real = len(group)
        pad = np.zeros_like(group[0])
        while len(group) < fuse:
            group.append(pad)
        yield np.stack(group), gb, n_real


def count_reads(
    table: KmerTable,
    fastq_files: list[str],
    k: int,
    batch_size: int,
    max_len: int,
    n_devices: int = 0,
    io_threads: int = 4,
) -> int:
    """Stream all files, count k-mers into table.cov.  Returns total bases.

    n_devices: device-mesh width (config.mesh_devices); 0 = all local.
    io_threads: FASTQ files decompressed/packed concurrently (CLI -t)."""
    read_base = 0
    ngroups = 0
    nbatches = 0
    max_len = (max_len + 3) // 4 * 4  # packed wire rows need L % 4 == 0

    # multi-device: shard each batch across the mesh, psum the count deltas
    # (parallel/mesh.py); single device uses the donated fused step
    n_dev = jax.local_device_count()
    if n_devices:
        n_dev = min(n_devices, n_dev)
    mesh_step = None
    sharding = None
    if n_dev > 1 and batch_size % n_dev == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import make_count_batch_replicated_packed, make_mesh

        mesh = make_mesh(n_dev)
        mesh_step = make_count_batch_replicated_packed(mesh, k)
        # fused groups upload sharded over the batch axis; slicing group[j]
        # yields a [B, L] array already laid out P("data", None)
        sharding = NamedSharding(mesh, P(None, "data", None))
        log(f"counting data-parallel over {n_dev} devices", func="count_reads")

    for path in fastq_files:
        log(f"Collecting kmers from read on device: {path}", func="count_reads")

    # large-table regime: stash sketched queries into HBM buffers, join once
    # per _SUPER_ROWS sub-batches (see _BANDED_MAX_KEYS above).  Two buffers
    # round-robin so the next super-group's stashes overlap the in-flight
    # join that still reads the previous buffer.
    big_table = mesh_step is None and table.size > _BANDED_MAX_KEYS
    bufs: list = []
    buf_i = 0
    filled = 0  # sub-batch rows stashed into the current buffer
    if big_table:
        nq = batch_size * (max_len - k + 1)
        bufs = [jnp.full((_SUPER_ROWS, nq), _SENTINEL, jnp.uint64)
                for _ in range(2)]
        log(f"large-table counting: {table.size / 1e6:.1f}M keys, "
            f"super-join every {_SUPER_ROWS} batches "
            f"({_SUPER_ROWS * nq / 1e6:.0f}M query slots)",
            func="count_reads")

    accs = [table.cov] + [
        jnp.zeros_like(table.cov) for _ in range(_N_ACCUMULATORS - 1)
    ]

    def upload(arr):
        return jax.device_put(arr, sharding) if sharding is not None \
            else jax.device_put(arr)

    pool = ThreadPoolExecutor(max_workers=_UPLOAD_DEPTH)
    inflight: collections.deque = collections.deque()
    # deferred pacing: a tiny [:1] slice handle is created right after a
    # dispatch (before any later donation can invalidate the buffer) and
    # FETCHED one pace-point later, so the device always has the next
    # super-join / group window queued while the client syncs on the
    # previous one -- bounded lead without stalling the pipeline
    pending_sync = None

    def sync_point(arr):
        nonlocal pending_sync
        h = arr[:1]
        if pending_sync is not None:
            np.asarray(jax.device_get(pending_sync))
        pending_sync = h

    def drain_one():
        nonlocal read_base, ngroups, nbatches, buf_i, filled
        fut, gb, n_real = inflight.popleft()
        dev = fut.result()
        slot = ngroups % _N_ACCUMULATORS
        if mesh_step is not None:
            for j in range(n_real):
                accs[slot] = mesh_step(accs[slot], table.keys, dev[j])
        elif big_table:
            bufs[buf_i] = _sketch_to_rows(bufs[buf_i], dev,
                                          _i32(filled), k)
            filled += dev.shape[0]
            if filled >= _SUPER_ROWS:
                accs[0] = _join_rows(accs[0], table.keys, bufs[buf_i],
                                     _i32(filled))
                sync_point(accs[0])
                buf_i = 1 - buf_i
                filled = 0
        else:
            accs[slot] = _count_fused(accs[slot], table.keys, dev, k)
            if ngroups % _PACE_GROUPS == _PACE_GROUPS - 1:
                sync_point(accs[slot])
        read_base += gb
        ngroups += 1
        nbatches += n_real

    try:
        for stacked, gb, n_real in _fused_groups(
            stream_packed_batches_multi(fastq_files, batch_size, max_len, k,
                                        max_parallel=max(io_threads, 1)),
            _FUSE,
        ):
            inflight.append((pool.submit(upload, stacked), gb, n_real))
            if len(inflight) >= _UPLOAD_DEPTH:
                drain_one()
        while inflight:
            drain_one()
        if big_table and filled:
            accs[0] = _join_rows(accs[0], table.keys, bufs[buf_i],
                                 _i32(filled))
    finally:
        pool.shutdown(wait=False)

    cov = accs[0]
    for extra in accs[1:]:
        cov = cov + extra
    _pace(cov)  # real sync: block_until_ready returns early via the tunnel
    table.cov = cov
    log(f"Processed {nbatches} batches, {read_base / 1e9:.2f} Gb",
        func="count_reads")
    return read_base
