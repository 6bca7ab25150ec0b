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


def test_sharded_cbf_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec

    from varigraph_tpu.ops.cbf import CountingBloomFilter
    from varigraph_tpu.parallel.mesh import (
        make_cbf_add_sharded,
        make_cbf_count_sharded,
        make_mesh,
    )

    mesh = make_mesh(8)
    rng = np.random.default_rng(17)
    n = 4096
    bf = CountingBloomFilter(n=n, p=0.01, seed=3)
    hashes = rng.integers(1, 1 << 60, size=2048, dtype=np.uint64)
    # duplicates to exercise counters > 1
    hashes[1024:] = hashes[:1024]
    mask = rng.random(2048) < 0.9
    bf.add(hashes, mask)

    m = bf.size
    filt_sh = jax.device_put(
        jnp.zeros((m,), jnp.uint8), NamedSharding(mesh, PartitionSpec("data"))
    )
    add = make_cbf_add_sharded(mesh, m, bf.num_hashes)
    filt_sh = add(filt_sh, jnp.asarray(hashes), jnp.asarray(mask),
                  jnp.asarray(bf.seeds))
    np.testing.assert_array_equal(np.asarray(filt_sh), np.asarray(bf.filter))

    count = make_cbf_count_sharded(mesh, m, bf.num_hashes)
    got = np.asarray(count(filt_sh, jnp.asarray(hashes), jnp.asarray(bf.seeds)))
    np.testing.assert_array_equal(got, bf.count(hashes))


def test_construct_with_sharded_cbf(tmp_path, monkeypatch):
    """Full construct with the sharded genome CBF must produce the identical
    index (force sharding via the env threshold)."""
    import importlib

    import varigraph_tpu.index.build as build_mod
    from data_gen import generate_dataset
    from varigraph_tpu.config import VarigraphConfig
    from varigraph_tpu.index.build import construct_graph_index

    out = str(tmp_path)
    paths, _ = generate_dataset(out, seed=31, chrom_lens={"chr1": 5000},
                                n_variants=15, samples=("S1",), depth=5.0)
    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    gi_single = construct_graph_index(cfg)

    monkeypatch.setattr(build_mod, "_CBF_SHARD_MIN", 1)
    gi_sharded = construct_graph_index(cfg)
    np.testing.assert_array_equal(
        np.asarray(gi_single.table.keys), np.asarray(gi_sharded.table.keys)
    )
    np.testing.assert_array_equal(
        np.asarray(gi_single.table.freq), np.asarray(gi_sharded.table.freq)
    )
    np.testing.assert_array_equal(
        np.asarray(gi_single.table.hapbits), np.asarray(gi_sharded.table.hapbits)
    )
