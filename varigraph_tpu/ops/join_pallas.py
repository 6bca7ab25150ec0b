"""Pallas banded merge-join for read k-mer counting.

THE PRODUCTION TPU COUNTING PATH, dispatched from
genotype/counting._count_batch whenever the backend is TPU.  Measured on
v5e (2026-08-18, tools/join_probe6.py): 7.67 ms/batch = 342M k-mers/s
device-side for a [16384, 160] read batch against a 103k-key table, vs
16.9 ms for the two-sort join (ops/table.py count_merge, which remains
the fallback inside jit when a query band overflows its two tiles, and
the production path on non-TPU backends).  The original 2x2048 band
overflowed at ~25 queries/key ratios; the widened TABLE_BLOCK=128 x
QBAND=4096 band fits (max band ~4.1k at bench shapes).

Remaining headroom: the query sort (~4 ms) now dominates the kernel; a
Pallas query sort or element-aligned band DMA would be the next lever.

The pipeline:

  1. sort the queries alone (one XLA u64 sort -- unavoidable; sorting IS
     the TPU's random-access primitive),
  2. for each 128-key block of the (static, sorted) table, find the query
     band that can contain equal values via an unrolled binary search of
     the block's min/max key (tiny: 2*M/128 lookups),
  3. a Pallas kernel compares each key block against its two aligned
     query-band tiles all-pairs on the VPU (64-bit equality as two u32
     compares -- Mosaic has no 64-bit vectors) and writes per-key match
     counts directly into table order.  No scatter anywhere.

Query bands wider than two tiles (a single k-mer repeated >QBAND times in
one batch, e.g. poly-A reads) fall back to the two-sort join via lax.cond.

Reference counterpart: the per-k-mer hash-map probe in
src/fastq_kmer.cpp:126-141 / kmer_sketch_fastq (src/kmer.cpp:110-149).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .table import _SENTINEL, _U64, binary_search, count_merge

TABLE_BLOCK = 128   # keys per grid step (output block)
QBAND = 4096        # query-band tile width (band may span two tiles)

_U32MASK = _U64(0xFFFFFFFF)


def _split64(v: jnp.ndarray):
    return (v >> _U64(32)).astype(jnp.uint32), (v & _U32MASK).astype(jnp.uint32)


def _band_kernel(jref, khi_ref, klo_ref, qhi0_ref, qlo0_ref, qhi1_ref,
                 qlo1_ref, out_ref):
    # keys arrive sublane-oriented [TB, 1]; query tiles lane-oriented
    # [1, QBAND]: the broadcast compare needs no in-kernel relayout
    khi = khi_ref[0]     # [TB, 1]
    klo = klo_ref[0]

    def tile_counts(qhi_ref, qlo_ref):
        m = (khi == qhi_ref[0]) & (klo == qlo_ref[0])   # [TB, QBAND]
        # dtype pinned: with jax_enable_x64 a bare sum would promote to i64,
        # which Mosaic cannot lower
        return jnp.sum(m.astype(jnp.int32), axis=1, keepdims=True,
                       dtype=jnp.int32)

    out_ref[0] = (
        tile_counts(qhi0_ref, qlo0_ref) + tile_counts(qhi1_ref, qlo1_ref)
    ).astype(jnp.uint32)


def _band_counts(keys_pad: jnp.ndarray, q_sorted_pad: jnp.ndarray,
                 jblk: jnp.ndarray, interpret: bool = False,
                 tb: int = TABLE_BLOCK, qband: int = QBAND) -> jnp.ndarray:
    """Per-key equal-query counts.  keys_pad [Mb*TB] u64 sorted (padded),
    q_sorted_pad [Qb*QBAND] u64 sorted (padded with sentinel), jblk [Mb]
    int32 aligned query-tile index per key block.

    Arrays carry an explicit middle dim of 1 so the (1, 1, width) block
    shape satisfies Mosaic's tiling rule (second-to-last block dim must be
    8-divisible OR equal to the array dim)."""
    mb = keys_pad.shape[0] // tb
    qb = q_sorted_pad.shape[0] // qband
    khi, klo = _split64(keys_pad.reshape(mb, tb, 1))
    qhi, qlo = _split64(q_sorted_pad.reshape(qb, 1, qband))

    # index-map constants must stay 32-bit: with jax_enable_x64 a literal 0
    # traces as i64, which Mosaic cannot legalize in the transform function
    # (numpy scalars are concrete, so they don't count as captured tracers)
    z = np.int32(0)
    one = np.int32(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mb,),
        in_specs=[
            pl.BlockSpec((1, tb, 1), lambda b, j: (b, z, z)),
            pl.BlockSpec((1, tb, 1), lambda b, j: (b, z, z)),
            pl.BlockSpec((1, 1, qband), lambda b, j: (j[b], z, z)),
            pl.BlockSpec((1, 1, qband), lambda b, j: (j[b], z, z)),
            pl.BlockSpec((1, 1, qband), lambda b, j: (j[b] + one, z, z)),
            pl.BlockSpec((1, 1, qband), lambda b, j: (j[b] + one, z, z)),
        ],
        out_specs=pl.BlockSpec((1, tb, 1), lambda b, j: (b, z, z)),
    )
    out = pl.pallas_call(
        _band_kernel,
        out_shape=jax.ShapeDtypeStruct((mb, tb, 1), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jblk, khi, klo, qhi, qlo, qhi, qlo)
    return out.reshape(-1)


def _pad_pow(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def count_merge_banded(cov: jnp.ndarray, keys: jnp.ndarray,
                       queries: jnp.ndarray, mask: jnp.ndarray,
                       interpret: bool = False,
                       tb: int = TABLE_BLOCK, qband: int = QBAND) -> jnp.ndarray:
    """Drop-in replacement for ops.table.count_merge using the Pallas
    banded join; falls back to the two-sort join when a band overflows.

    ``keys`` must be sorted, unique, with the k-mer span byte in bits 0-7
    (real spans are 1..28, so the padding key below never matches).
    """
    m = keys.shape[0]
    if m == 0:
        return cov
    mp = _pad_pow(m, tb)
    if mp != m:
        # pad key: sorts last, span byte 0x3F is never a real span and
        # differs from the query sentinel's 0xFF
        keys_pad = jnp.concatenate([
            keys, jnp.full((mp - m,), _U64(0xFFFFFFFFFFFFFF3F)),
        ])
    else:
        keys_pad = keys

    q = jnp.where(mask, queries, _SENTINEL)
    qn = q.shape[0]
    qp = max(_pad_pow(qn, qband), 2 * qband)  # >= 2 tiles for the j+1 spec
    if qp != qn:
        q = jnp.concatenate([q, jnp.full((qp - qn,), _SENTINEL)])
    q_sorted = jax.lax.sort(q)
    qb = qp // qband

    mb = mp // tb
    blockmin = keys_pad.reshape(mb, tb)[:, 0]
    blockmax = keys_pad.reshape(mb, tb)[:, -1]
    # tile mapping via the per-tile last values (a strided slice, qb
    # elements) -- searching the full q_sorted would gather from a >VMEM
    # HBM array at scalar speed (~9 ms measured)
    tile_last = q_sorted[qband - 1 :: qband]          # [qb]
    t0 = binary_search(tile_last, blockmin)           # first tile that can
    #                                                   hold a query == blockmin
    t1 = binary_search(tile_last, blockmax + _U64(1))  # tile holding the tail
    t1 = jnp.minimum(t1, qb - 1)
    jblk = jnp.minimum(t0, max(qb - 2, 0)).astype(jnp.int32)
    fits = jnp.all(t1 <= jblk + 1)

    def banded(_):
        counts = _band_counts(keys_pad, q_sorted, jblk, interpret=interpret,
                              tb=tb, qband=qband)
        return cov + counts[:m]

    def fallback(_):
        return count_merge(cov, keys, queries, mask)

    return jax.lax.cond(fits, banded, fallback, None)


@functools.partial(jax.jit, donate_argnums=(0,))
def add_counts_banded(cov, keys, queries, mask):
    return count_merge_banded(cov, keys, queries, mask)
