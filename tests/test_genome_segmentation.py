"""Row-segmented genome scanning must emit exactly the k-mer multiset of a
continuous rolling scan (odd k)."""

from collections import Counter

import numpy as np
import jax.numpy as jnp

from varigraph_tpu.index.build import segment_genome_batches
from varigraph_tpu.ops.kmer import sketch_codes
from varigraph_tpu.ops.sketch_ref import sketch_ref


def _segmented_multiset(seq, k, rows=8, cols=40):
    out = Counter()
    for batch in segment_genome_batches(seq, k, rows=rows, cols=cols):
        values, emit = sketch_codes(jnp.asarray(batch), k)
        values = np.asarray(values)[np.asarray(emit)]
        out.update(values.tolist())
    return out


def test_segmented_equals_continuous():
    rng = np.random.default_rng(0)
    for k in (5, 15, 27):
        for n in (10, 39, 40, 41, 200, 1000):
            seq = "".join(rng.choice(list("ACGTN"), size=n,
                                     p=[0.24, 0.24, 0.24, 0.24, 0.04]))
            expected = Counter(sketch_ref(seq, k))
            got = _segmented_multiset(seq, k)
            assert got == expected, (k, n)


def test_segmented_repeat_counts():
    # repeated k-mers must be counted with multiplicity
    seq = "ACGTACGTACGT" * 20
    k = 7
    expected = Counter(sketch_ref(seq, k))
    assert max(expected.values()) > 1
    assert _segmented_multiset(seq, k) == expected
