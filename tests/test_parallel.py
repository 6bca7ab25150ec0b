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


def test_window_sharded_scoring_matches_oracle(tmp_path):
    """Production genotype_jax with the window axis sharded over 8 local
    devices (Wg == 8 via small granularity) must call the same GTs as the
    longdouble oracle -- the window-parallel HMM production path of
    VERDICT r4 #6 / SURVEY section 2.4."""
    from data_gen import generate_dataset
    from varigraph_tpu.config import VarigraphConfig
    from varigraph_tpu.genotype.counting import count_reads
    from varigraph_tpu.genotype.coverage import estimate_hap_coverage
    from varigraph_tpu.genotype.engine_jax import genotype_jax
    from varigraph_tpu.genotype.engine_np import genotype_np, graph2node

    out = str(tmp_path)
    paths, _ = generate_dataset(
        out, seed=57, chrom_lens={"chr1": 16000}, n_variants=40,
        samples=("S1", "S2"), depth=30.0,
    )
    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    gi = construct_graph_index_cached(cfg)
    graph2node(gi)
    gcfg = VarigraphConfig(kmer_len=27, vcf_ploidy=2, seed=0,
                           granularity_bp=2000)  # 16 kb / 2 kb = 8 windows
    read_base = count_reads(gi.table, [paths["fq"]], 27,
                            gcfg.read_batch_size, gcfg.max_read_len)
    hap_cov = estimate_hap_coverage(
        gi.table.cov_u8(), gi.table.freq_np(), gi.table.hap_words_np(),
        gi.nhap, gi.vcf_ploidy, 2, read_base / gi.genome_size, False,
    )
    res_np = genotype_np(gi, gcfg, hap_cov, 0)
    res_jax = genotype_jax(gi, gcfg, hap_cov, 0)
    assert set(res_np.keys()) == set(res_jax.keys()) and res_np
    node_by_pos = {
        (c, n.start): n for c in gi.graph.nodes for n in gi.graph.nodes[c]
    }
    for key in res_np:
        node = node_by_pos[key]
        gt_np = sorted(node.hap_gt[h] for h in res_np[key].hap_vec) \
            if res_np[key].hap_vec else None
        gt_jx = sorted(node.hap_gt[h] for h in res_jax[key].hap_vec) \
            if res_jax[key].hap_vec else None
        assert gt_np == gt_jx, (key, gt_np, gt_jx)


def construct_graph_index_cached(cfg):
    from varigraph_tpu.index.build import construct_graph_index

    return construct_graph_index(cfg)
