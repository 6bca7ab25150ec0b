"""End-to-end construct phase: FASTA+VCF -> GraphIndex -> save/load."""

import numpy as np
import pytest

from varigraph_tpu.config import VarigraphConfig
from varigraph_tpu.index.build import construct_graph_index
from varigraph_tpu.index.serialize import load_graph, save_graph
from varigraph_tpu.ops.sketch_ref import sketch_ref

from data_gen import generate_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("construct_ds")
    paths, truth = generate_dataset(
        str(out), seed=5, chrom_lens={"chr1": 3000}, n_variants=12,
        samples=("S1", "S2"), depth=20.0,
    )
    return paths, truth


@pytest.fixture(scope="module")
def graph_index(dataset):
    paths, _ = dataset
    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    return construct_graph_index(cfg)


def test_construct_basics(graph_index):
    gi = graph_index
    assert gi.kmer_len == 27
    assert gi.nhap == 5  # reference + 2 samples x ploidy 2
    assert gi.table.size > 0
    # every variant node got k-mers
    n_var = 0
    with_kmers = 0
    for chrom in gi.graph.nodes:
        for node in gi.graph.nodes[chrom]:
            if node.is_variant:
                n_var += 1
                if len(node.kmer_hashes):
                    with_kmers += 1
                    assert len(node.local_bits) == len(node.kmer_hashes)
    assert n_var == 12
    assert with_kmers >= 10  # nearly all nodes produce k-mers


def test_alt_kmers_present_in_table(graph_index, dataset):
    """k-mers spanning an ALT allele context must be in the table with the
    carrying haplotype's bit set."""
    gi = graph_index
    keys = gi.table.keys_np()
    bit_rows = gi.table.hapbit_rows_np()
    found_any = False
    for chrom in gi.graph.nodes:
        starts = gi.graph.starts[chrom]
        nodes = gi.graph.nodes[chrom]
        for idx, node in enumerate(nodes):
            if not node.is_variant or len(node.seqs) < 2:
                continue
            for hap in range(1, len(node.hap_gt)):
                gt = node.hap_gt[hap]
                if gt == 0:
                    continue
                from varigraph_tpu.index.graph import find_node_up_down_seq
                up, down, alt = find_node_up_down_seq(
                    hap, gt, node.seqs[gt], gi.kmer_len - 1, idx, starts, nodes
                )
                ctx_kmers = set(sketch_ref(up + alt + down, gi.kmer_len))
                node_set = set(node.kmer_hashes)
                shared = ctx_kmers & node_set
                for kh in list(shared)[:5]:
                    i = np.searchsorted(keys, np.uint64(kh))
                    assert keys[i] == kh
                    assert bit_rows[i, hap] == 1
                    found_any = True
                break
            break
    assert found_any


def test_freq_semantics(graph_index):
    """Unique-context k-mers get f=1; genome-repeated k-mers get CBF-derived
    f >= 2 (or node-repeat increments)."""
    gi = graph_index
    freq = gi.table.freq_np()
    assert (freq >= 1).all()
    # most synthetic-genome k-mers are unique
    assert (freq == 1).mean() > 0.5


def test_save_load_roundtrip(tmp_path, graph_index):
    gi = graph_index
    p = str(tmp_path / "graph.vgt")
    save_graph(gi, p)
    gi2 = load_graph(p)
    assert gi2.kmer_len == gi.kmer_len
    assert gi2.vcf_ploidy == gi.vcf_ploidy
    assert gi2.hap_names == gi.hap_names
    assert gi2.vcf_head == gi.vcf_head
    assert (gi2.table.keys_np() == gi.table.keys_np()).all()
    assert (gi2.table.freq_np() == gi.table.freq_np()).all()
    assert (gi2.table.hapbit_rows_np() == gi.table.hapbit_rows_np()).all()
    assert (gi2.table.refflag_np() == gi.table.refflag_np()).all()
    for chrom in gi.graph.nodes:
        a_nodes = gi.graph.nodes[chrom]
        b_nodes = gi2.graph.nodes[chrom]
        assert len(a_nodes) == len(b_nodes)
        for a, b in zip(a_nodes, b_nodes):
            assert a.start == b.start
            assert a.seqs == b.seqs
            assert list(a.hap_gt) == list(b.hap_gt)
            assert np.array_equal(a.kmer_hashes, b.kmer_hashes)
            assert np.asarray(a.local_bits).size == np.asarray(b.local_bits).size
            if np.asarray(a.local_bits).size:
                assert (np.asarray(a.local_bits) == np.asarray(b.local_bits)).all()
    # vcf info mirror
    for c in gi.vcf_info:
        assert gi.vcf_info[c] == gi2.vcf_info[c]


def test_construct_deterministic(dataset):
    paths, _ = dataset
    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    a = construct_graph_index(cfg)
    b = construct_graph_index(cfg)
    assert (a.table.keys_np() == b.table.keys_np()).all()
    assert (a.table.freq_np() == b.table.freq_np()).all()


def test_threaded_construct_matches_serial(tmp_path):
    """-t N construct (forked context walking) must produce the exact same
    index as the single-threaded path."""
    paths, _ = generate_dataset(
        str(tmp_path), seed=17, chrom_lens={"chr1": 60000}, n_variants=300,
        samples=("S1", "S2"), depth=5.0,
    )
    cfg1 = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                           kmer_len=27, seed=0, threads=1)
    cfg2 = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                           kmer_len=27, seed=0, threads=2)
    gi1 = construct_graph_index(cfg1)
    gi2 = construct_graph_index(cfg2)
    assert (gi1.table.keys_np() == gi2.table.keys_np()).all()
    assert (gi1.table.freq_np() == gi2.table.freq_np()).all()
    assert (gi1.table.hap_words_np() == gi2.table.hap_words_np()).all()
    assert (gi1.table.refflag_np() == gi2.table.refflag_np()).all()
    for chrom in gi1.graph.nodes:
        for n1, n2 in zip(gi1.graph.nodes[chrom], gi2.graph.nodes[chrom]):
            assert np.array_equal(n1.kmer_hashes, n2.kmer_hashes)
            assert np.array_equal(n1.local_bits, n2.local_bits)


def test_construct_with_passwise_cbf(tmp_path, monkeypatch):
    """Forcing the pass-wise CBF (multi-Gbp single-chip path) produces an
    index nearly identical to the device-CBF construct (sizing differs --
    exact m vs pow2 -- so rare collision-dependent keep decisions may
    differ, but the k-mer sets must overlap almost completely)."""
    import varigraph_tpu.index.build as build_mod

    paths, _ = generate_dataset(
        str(tmp_path), seed=29, chrom_lens={"chr1": 8000}, n_variants=20,
        samples=("S1", "S2"), depth=5.0,
    )
    cfg = VarigraphConfig(ref_file=paths["ref"], vcf_file=paths["vcf"],
                          kmer_len=27, seed=0)
    gi_dev = construct_graph_index(cfg)
    monkeypatch.setattr(build_mod, "_CBF_DEVICE_MAX", 1)
    gi_host = construct_graph_index(cfg)
    a = set(gi_dev.table.keys_np().tolist())
    b = set(gi_host.table.keys_np().tolist())
    assert len(a & b) / max(len(a | b), 1) > 0.99
