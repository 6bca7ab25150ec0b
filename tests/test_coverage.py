"""Coverage-model unit tests: the packed-word homozygosity test must agree
with the straightforward unpacked formulation (the reference's per-k-mer
loops over sample GT groups, varigraph.cpp:253-296)."""

import numpy as np
import pytest

from varigraph_tpu.genotype.coverage import hom_kmer_histogram
from varigraph_tpu.ops.table import pack_hapbits, unpack_hapbits


def _hist_unpacked(cov_u8, freq, hap_words, nhap, vcf_ploidy):
    """Spec oracle: unpack every row, group per sample, all/any."""
    mask = (cov_u8 > 0) & (freq == 1)
    nsample = (nhap - 1) // vcf_ploidy
    if nsample == 0:
        return np.zeros(256, np.uint64)
    idx = np.flatnonzero(mask)
    rows = unpack_hapbits(hap_words[idx], nhap)
    groups = rows[:, 1 : 1 + nsample * vcf_ploidy].reshape(
        len(idx), nsample, vcf_ploidy
    )
    hom_any = groups.all(axis=2).any(axis=1)
    return np.bincount(cov_u8[idx[hom_any]], minlength=256).astype(np.uint64)


@pytest.mark.parametrize("nhap,ploidy", [(5, 2), (201, 2), (33, 2), (13, 4),
                                         (64, 2), (7, 3)])
def test_packed_hom_histogram_matches_unpacked(nhap, ploidy):
    rng = np.random.default_rng(nhap * 10 + ploidy)
    m = 4096
    bits = (rng.random((m, nhap)) < 0.3).astype(np.uint8)
    words = pack_hapbits(bits)
    cov = rng.integers(0, 60, size=m).astype(np.uint8)
    freq = rng.integers(1, 3, size=m).astype(np.uint8)
    got = hom_kmer_histogram(cov, freq, words, nhap, ploidy)
    want = _hist_unpacked(cov, freq, words, nhap, ploidy)
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 0


def test_packed_hom_histogram_shift_crosses_words():
    """Sample groups straddling u32 word boundaries (hap 31/32 etc.)."""
    nhap, ploidy = 66, 2
    m = 512
    bits = np.zeros((m, nhap), np.uint8)
    # sample 15 = haps 31,32 (crosses the word boundary); set hom for half
    bits[: m // 2, 31] = 1
    bits[: m // 2, 32] = 1
    words = pack_hapbits(bits)
    cov = np.full(m, 7, np.uint8)
    freq = np.ones(m, np.uint8)
    got = hom_kmer_histogram(cov, freq, words, nhap, ploidy)
    want = _hist_unpacked(cov, freq, words, nhap, ploidy)
    np.testing.assert_array_equal(got, want)
    assert int(got[7]) == m // 2
