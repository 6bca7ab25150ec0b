"""Native C++ reader parity with the pure-Python streamer across all code
paths: libdeflate whole-buffer, zlib streaming, plain files, FASTA."""

import gzip
import os

import numpy as np
import pytest

import varigraph_tpu.native.loader as ld
from varigraph_tpu.io.fastq import (
    stream_read_batches,
    stream_read_batches_native,
)

B, L, K = 256, 160, 27


@pytest.fixture(scope="module")
def fastq_gz(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nat") / "reads.fq.gz")
    rng = np.random.default_rng(3)
    with gzip.open(path, "wt") as fh:
        for i in range(3000):
            n = int(rng.integers(20, 400))  # incl. reads longer than max_len
            r = "".join(rng.choice(list("ACGTN"), size=n))
            fh.write(f"@read{i} extra\n{r}\n+\n{'I' * n}\n")
    return path


def _python_batches(path):
    orig = ld.get_fastq_lib
    ld.get_fastq_lib = lambda: None
    try:
        return list(stream_read_batches(path, B, L, K))
    finally:
        ld.get_fastq_lib = orig


def _assert_same(a_batches, b_batches):
    assert len(a_batches) == len(b_batches)
    for (a, ba), (b, bb) in zip(a_batches, b_batches):
        assert np.array_equal(a, b)
        assert ba == bb


@pytest.fixture(scope="module")
def native_lib():
    if ld.get_fastq_lib() is None:
        pytest.skip("no C++ toolchain")


def test_fastq_gz_parity(fastq_gz, native_lib):
    _assert_same(
        list(stream_read_batches_native(fastq_gz, B, L, K)),
        _python_batches(fastq_gz),
    )


def test_zlib_streaming_path_parity(fastq_gz, native_lib):
    os.environ["VGF_WHOLE_MAX"] = "10"  # compressed size cap -> force zlib
    try:
        streamed = list(stream_read_batches_native(fastq_gz, B, L, K))
    finally:
        os.environ.pop("VGF_WHOLE_MAX")
    _assert_same(streamed, _python_batches(fastq_gz))


def test_plain_file_parity(fastq_gz, native_lib, tmp_path):
    plain = str(tmp_path / "reads.fq")
    with gzip.open(fastq_gz, "rb") as src, open(plain, "wb") as dst:
        dst.write(src.read())
    _assert_same(
        list(stream_read_batches_native(plain, B, L, K)),
        _python_batches(fastq_gz),
    )


def test_fasta_gz_parity(native_lib, tmp_path):
    path = str(tmp_path / "seqs.fa.gz")
    rng = np.random.default_rng(7)
    with gzip.open(path, "wt") as fh:
        for i in range(40):
            n = int(rng.integers(50, 5000))
            r = "".join(rng.choice(list("ACGT"), size=n))
            fh.write(f">seq{i}\n")
            for j in range(0, n, 70):
                fh.write(r[j : j + 70] + "\n")
    _assert_same(
        list(stream_read_batches_native(path, B, L, K)),
        _python_batches(path),
    )
