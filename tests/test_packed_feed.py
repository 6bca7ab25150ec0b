"""The 2-bit packed read feed (io/fastq.stream_packed_batches +
ops/kmer.unpack_2bit) must emit exactly the spec oracle's k-mer multiset:
N-splitting, max_len-splitting (k-1 overlap), and short-segment dropping
change the row structure but never the k-mers.

Reference counterpart: the rolling scan's N-reset (src/kmer.cpp:48) makes
no k-mer span an ambiguous base, so hard-splitting reads at N is exact.
"""

import gzip
import os

import jax.numpy as jnp
import numpy as np
import pytest

from varigraph_tpu.io import fastq as F
from varigraph_tpu.ops.kmer import pack_codes_np, sketch_codes, unpack_2bit
from varigraph_tpu.ops.sketch_ref import sketch_ref

K = 15
B, L = 64, 96


def _make_reads():
    rng = np.random.default_rng(7)
    reads = []
    for i in range(40):
        n = int(rng.integers(20, 400))
        r = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
        if i % 5 == 1:  # interior Ns
            pos = set(rng.integers(0, n, size=max(1, n // 50)).tolist())
            r = "".join("N" if j in pos else ch for j, ch in enumerate(r))
        reads.append(r)
    reads.append("ACGT")      # shorter than k: emits nothing
    reads.append("N" * 30)    # all ambiguous
    reads.append("AC" + "N" * 3 + "A" * 40 + "N" + "C" * 20)  # mixed runs
    return reads


def _write_fq(path, reads):
    with gzip.open(path, "wt") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def _emitted(packed_stream):
    got, tot_bases = [], 0
    for packed, bases in packed_stream:
        tot_bases += bases
        codes = np.asarray(unpack_2bit(jnp.asarray(packed)))
        v, e = sketch_codes(jnp.asarray(codes), K)
        got.extend(np.asarray(v).reshape(-1)[np.asarray(e).reshape(-1)])
    return np.sort(np.asarray(got, np.uint64)), tot_bases


@pytest.fixture(scope="module")
def fq(tmp_path_factory):
    reads = _make_reads()
    path = str(tmp_path_factory.mktemp("packed") / "r.fq.gz")
    _write_fq(path, reads)
    want = []
    for r in reads:
        want.extend(sketch_ref(r.encode(), K))
    return path, np.sort(np.asarray(want, np.uint64)), sum(len(r) for r in reads)


def test_packed_stream_matches_spec_oracle(fq):
    path, want, nbases = fq
    got, bases = _emitted(F.stream_packed_batches(path, B, L, K))
    assert bases == nbases
    assert np.array_equal(got, want)


def test_python_fallback_matches_native(fq, monkeypatch):
    path, want, nbases = fq
    monkeypatch.setattr(F, "stream_packed_batches_native",
                        lambda *a, **kw: None)
    got, bases = _emitted(F.stream_packed_batches(path, B, L, K))
    assert bases == nbases
    assert np.array_equal(got, want)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(8, 32), dtype=np.uint8).astype(np.uint8)
    lens = rng.integers(0, 33, size=8).astype(np.int32)
    packed = pack_codes_np(codes, lens)
    assert packed.shape == (8, 32 // 4 + 2)
    out = np.asarray(unpack_2bit(jnp.asarray(packed)))
    for r in range(8):
        n = lens[r]
        assert np.array_equal(out[r, :n], codes[r, :n])
        assert (out[r, n:] == 4).all()


def test_multi_file_packed(fq, tmp_path):
    path, want, nbases = fq
    # two copies of the file: the multiset doubles
    got, bases = _emitted(
        F.stream_packed_batches_multi([path, path], B, L, K, max_parallel=2)
    )
    assert bases == 2 * nbases
    assert np.array_equal(got, np.sort(np.concatenate([want, want])))
