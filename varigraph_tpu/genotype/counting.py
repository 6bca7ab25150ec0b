"""Read k-mer counting against the graph table, batched on device.

Replaces the reference's thread-pooled per-read hash-map probing
(src/fastq_kmer.cpp:65-187, kmer_sketch_fastq at src/kmer.cpp:110-149) with:
  FASTQ stream -> packed [B, L] base-code batches -> device sketch scan ->
  vectorized binary search into the sorted table -> scatter-add coverage.

The whole per-batch pipeline is one fused jitted function; the table's
coverage array stays on device (donated across batches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..io.fastq import stream_read_batches
from ..ops.kmer import sketch_codes
from ..ops.table import KmerTable, count_merge
from ..utils.log import log


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(0,))
def _count_batch(cov: jnp.ndarray, keys: jnp.ndarray, codes: jnp.ndarray, k: int):
    values, emit = sketch_codes(codes, k)
    return count_merge(cov, keys, values.reshape(-1), emit.reshape(-1))


def count_reads(
    table: KmerTable,
    fastq_files: list[str],
    k: int,
    batch_size: int,
    max_len: int,
) -> int:
    """Stream all files, count k-mers into table.cov.  Returns total bases."""
    read_base = 0
    nbatches = 0
    for path in fastq_files:
        log(f"Collecting kmers from read on device: {path}", func="count_reads")
        for codes, bases in stream_read_batches(path, batch_size, max_len, k):
            table.cov = _count_batch(table.cov, table.keys, jnp.asarray(codes), k)
            read_base += bases
            nbatches += 1
    log(f"Processed {nbatches} batches, {read_base / 1e9:.2f} Gb", func="count_reads")
    return read_base
