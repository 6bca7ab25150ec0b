"""Unit tests for the canonical k-mer sketch.

The device scan (ops/kmer.py) must match the host rolling port
(ops/sketch_ref.py) of reference src/kmer.cpp:20-52 exactly, including
palindrome skipping, N resets, and stale-register warmup behavior.
"""

import numpy as np
import pytest

from varigraph_tpu.ops.kmer import pack_seqs, sketch_codes, sketch_seq
from varigraph_tpu.ops.sketch_ref import encode_bases_np, hash64_np, sketch_ref


def revcomp(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def naive_canonical_kmers(seq: str, k: int) -> list[int]:
    """Independent naive spec: for contiguous ACGT windows, canonical =
    min(2-bit(fwd), 2-bit(revcomp)); palindromes skipped.  Ignores the warmup
    subtlety, so only valid on palindrome-free, N-free sequences."""
    mask = (1 << (2 * k)) - 1
    code = {"A": 0, "C": 1, "G": 2, "T": 3}
    out = []
    for i in range(len(seq) - k + 1):
        win = seq[i : i + k]
        if any(c not in code for c in win):
            continue
        f = 0
        for c in win:
            f = (f << 2) | code[c]
        r = 0
        for c in revcomp(win):
            r = (r << 2) | code[c]
        if f == r:
            continue
        out.append((hash64_np(min(f, r), mask) << 8) | k)
    return out


@pytest.mark.parametrize("k", [5, 7, 27])
def test_sketch_matches_naive_spec(k):
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), size=300))
    ref = sketch_ref(seq, k)
    naive = naive_canonical_kmers(seq, k)
    # On palindrome-free input the rolling port equals the naive windowed spec.
    if ref == naive:
        assert ref == naive
    else:
        # palindromes occurred: rolling may emit fewer during warmup
        assert set(ref).issubset(set(naive))


@pytest.mark.parametrize("k", [5, 6, 27, 28])
def test_device_scan_matches_rolling_port(k):
    rng = np.random.default_rng(1)
    seqs = []
    for n in (1, k - 1, k, k + 1, 50, 200):
        seqs.append("".join(rng.choice(list("ACGT"), size=max(n, 1))))
    # sequences with Ns at various spots
    seqs.append("ACGTN" * 20)
    seqs.append("N" * 10 + "ACGTACGTACGTACGTACGTACGTACGTACGT")
    s = "".join(rng.choice(list("ACGTN"), size=500, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
    seqs.append(s)
    for seq in seqs:
        expected = sketch_ref(seq, k)
        got = sketch_seq(seq, k).tolist()
        assert got == expected, f"mismatch for k={k} len={len(seq)}"


def test_palindrome_handling():
    # "ACGT" extended: windows like ACGT (k=4)... use k=6 palindrome ACGCGT?
    # revcomp(ACGCGT) = ACGCGT -> palindrome, skipped and warmup extended.
    k = 6
    pal = "ACGCGT"
    assert revcomp(pal) == pal
    seq = pal + "AACCGGTT"
    expected = sketch_ref(seq, k)
    got = sketch_seq(seq, k).tolist()
    assert got == expected


def test_batched_pack_matches_per_seq():
    k = 11
    rng = np.random.default_rng(2)
    seqs = ["".join(rng.choice(list("ACGTN"), size=int(n),
                               p=[0.24, 0.24, 0.24, 0.24, 0.04]))
            for n in rng.integers(5, 150, size=16)]
    codes = pack_seqs(seqs)
    values, emit = sketch_codes(codes, k)
    values = np.asarray(values)
    emit = np.asarray(emit)
    for i, seq in enumerate(seqs):
        expected = sketch_ref(seq, k)
        got = values[i][emit[i]].tolist()
        assert got == expected


def test_n_reset_prevents_straddling_windows():
    k = 5
    seq = "ACGTA" + "N" + "ACGTA"
    ref = sketch_ref(seq, k)
    # each side yields exactly 1 window (len 5, k=5), none straddle the N
    assert len(ref) <= 2
    assert sketch_seq(seq, k).tolist() == ref


def test_span_encoding():
    k = 9
    vals = sketch_seq("ACGTACGTACGTACGT", k)
    assert all(int(v) & 0xFF == k for v in vals)
