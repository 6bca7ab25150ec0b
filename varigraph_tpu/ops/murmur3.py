"""MurmurHash3 x64_128 specialized to 8-byte keys, vectorized in JAX.

The reference hashes each 64-bit k-mer encoding with MurmurHash3_x64_128
(reference src/MurmurHash3.cpp:256-332) through BloomFilter::_murmur_hash
(src/counting_bloom_filter.cpp:90-98), which returns h1 + h2.  For an 8-byte
little-endian key the general algorithm collapses to a closed form with zero
body blocks and an 8-byte tail, which is what is implemented here (derived
from the public-domain algorithm definition, not transcribed):

  h1 = h2 = seed            (seed is truncated to uint32 by the reference's
                             _murmur_hash signature -- `unsigned int seed`)
  k1 = key * c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1
  h1 ^= 8; h2 ^= 8; h1 += h2; h2 += h1
  h1 = fmix64(h1); h2 = fmix64(h2); h1 += h2; h2 += h1
  return h1 + h2
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U64 = jnp.uint64

# numpy scalars, NOT jnp: module-level jnp constants would instantiate the
# XLA backend at import time, which breaks jax.distributed.initialize()
_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)


def _rotl64(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _fmix64(h: jnp.ndarray) -> jnp.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _U64(0xFF51AFD7ED558CCD)
    h = h ^ (h >> _U64(33))
    h = h * _U64(0xC4CEB9FE1A85EC53)
    h = h ^ (h >> _U64(33))
    return h


def murmur3_x64_128_u64key(key: jnp.ndarray, seed) -> jnp.ndarray:
    """h1 + h2 of MurmurHash3_x64_128 over the 8 little-endian bytes of *key*.

    Args:
      key: uint64 array of any shape.
      seed: scalar; only the low 32 bits are used (matching the reference's
        implicit uint64 -> unsigned int truncation at
        counting_bloom_filter.cpp:30).
    """
    seed32 = _U64(int(seed) & 0xFFFFFFFF) if not hasattr(seed, "dtype") else (
        seed.astype(_U64) & _U64(0xFFFFFFFF)
    )
    key = key.astype(_U64)
    k1 = key * _C1
    k1 = _rotl64(k1, 31)
    k1 = k1 * _C2
    h1 = seed32 ^ k1
    h2 = seed32
    h1 = h1 ^ _U64(8)
    h2 = h2 ^ _U64(8)
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1 + h2
