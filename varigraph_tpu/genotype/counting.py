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

from ..io.fastq import stream_read_batches_multi
from ..ops.kmer import sketch_codes
from ..ops.table import KmerTable, count_merge
from ..utils.log import log


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(0,))
def _count_batch(cov: jnp.ndarray, keys: jnp.ndarray, codes: jnp.ndarray, k: int):
    values, emit = sketch_codes(codes, k)
    q, em = values.reshape(-1), emit.reshape(-1)
    if _on_tpu():
        # Pallas banded merge-join: 7.7 ms/batch vs 16.9 ms for the two-sort
        # join at bench shapes (v5e, tools/join_probe6.py); falls back to the
        # two-sort join inside jit when a query band overflows its two tiles
        # (e.g. one k-mer repeated >4k times in a batch)
        from ..ops.join_pallas import count_merge_banded

        return count_merge_banded(cov, keys, q, em)
    return count_merge(cov, keys, q, em)


_N_ACCUMULATORS = 3  # round-robin coverage buffers so batch n+1's sort can
                     # start while batch n's scatter is still in flight


def count_reads(
    table: KmerTable,
    fastq_files: list[str],
    k: int,
    batch_size: int,
    max_len: int,
    n_devices: int = 0,
) -> int:
    """Stream all files, count k-mers into table.cov.  Returns total bases.

    n_devices: device-mesh width (config.mesh_devices); 0 = all local."""
    read_base = 0
    nbatches = 0

    # multi-device: shard each batch across the mesh, psum the count deltas
    # (parallel/mesh.py); single device uses the donated fused step
    n_dev = jax.local_device_count()
    if n_devices:
        n_dev = min(n_devices, n_dev)
    mesh_step = None
    if n_dev > 1 and batch_size % n_dev == 0:
        from ..parallel.mesh import make_count_batch_replicated, make_mesh

        mesh_step = make_count_batch_replicated(make_mesh(n_dev), k)
        log(f"counting data-parallel over {n_dev} devices", func="count_reads")

    accs = [table.cov] + [
        jnp.zeros_like(table.cov) for _ in range(_N_ACCUMULATORS - 1)
    ]
    for path in fastq_files:
        log(f"Collecting kmers from read on device: {path}", func="count_reads")
    for codes, bases in stream_read_batches_multi(
        fastq_files, batch_size, max_len, k
    ):
        slot = nbatches % _N_ACCUMULATORS
        if mesh_step is not None:
            accs[slot] = mesh_step(accs[slot], table.keys, jnp.asarray(codes))
        else:
            accs[slot] = _count_batch(accs[slot], table.keys,
                                      jnp.asarray(codes), k)
        read_base += bases
        nbatches += 1
    cov = accs[0]
    for extra in accs[1:]:
        cov = cov + extra
    cov.block_until_ready()
    table.cov = cov
    log(f"Processed {nbatches} batches, {read_base / 1e9:.2f} Gb", func="count_reads")
    return read_base
