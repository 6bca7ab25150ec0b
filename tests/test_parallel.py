"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from varigraph_tpu.ops.kmer import pack_seqs
from varigraph_tpu.ops.sketch_ref import sketch_ref
from varigraph_tpu.parallel.mesh import (
    make_count_batch_hash_sharded,
    make_count_batch_replicated,
    make_hom_histogram,
    make_mesh,
    shard_table_arrays,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    k = 15
    genome = "".join(rng.choice(list("ACGT"), size=3000))
    kmers = []
    for i in range(0, 2800, 40):
        kmers.extend(sketch_ref(genome[i : i + 60], k))
    keys = np.unique(np.array(kmers, dtype=np.uint64))
    reads = [genome[i : i + 64] for i in range(0, 2048, 16)]  # 128 reads
    codes = pack_seqs([r.encode() for r in reads], max_len=64)
    # single-device expected counts
    expected = np.zeros(len(keys), np.uint32)
    for r in reads:
        for h in sketch_ref(r, k):
            j = np.searchsorted(keys, np.uint64(h))
            if j < len(keys) and keys[j] == h:
                expected[j] += 1
    return mesh, k, keys, codes, expected


def test_replicated_counting_matches_single_device(setup):
    mesh, k, keys, codes, expected = setup
    step = make_count_batch_replicated(mesh, k)
    cov = jnp.zeros(len(keys), jnp.uint32)
    cov = step(cov, jnp.asarray(keys), jnp.asarray(codes))
    assert (np.asarray(cov) == expected).all()


def test_hash_sharded_counting_matches_single_device(setup):
    mesh, k, keys, codes, expected = setup
    cov0 = np.zeros(len(keys), np.uint32)
    keys_sh, cov_sh, m = shard_table_arrays(mesh, keys, cov0)
    step = make_count_batch_hash_sharded(mesh, k)
    cov_sh = step(cov_sh, keys_sh, jnp.asarray(codes))
    got = np.asarray(cov_sh)[:m]
    assert (got == expected).all()


def test_sharded_histogram(setup):
    mesh, k, keys, codes, expected = setup
    cov = expected.astype(np.uint8)
    pad = (-len(cov)) % 8
    cov_p = np.concatenate([cov, np.zeros(pad, np.uint8)])
    mask = np.concatenate([np.ones(len(cov), bool), np.zeros(pad, bool)])
    hist = make_hom_histogram(mesh)(jnp.asarray(cov_p), jnp.asarray(mask))
    ref_hist = np.bincount(cov, minlength=256)
    assert (np.asarray(hist) == ref_hist).all()
