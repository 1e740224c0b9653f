"""Vectorized trim path must agree exactly with the scalar reference
transcription."""
import numpy as np

from kmernator_tpu.io.reads import ReadSet
from kmernator_tpu.ops.trim import (_score_and_trim_scalar,
                                    _score_and_trim_vectorized)


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(5)
    n = 500
    k = 31
    lens = rng.integers(20, 150, n)
    rs = ReadSet()
    for i, L in enumerate(lens):
        rs.append_read(b"r%d" % i, b"", b"A" * int(L), np.full(int(L), 30))
    rs.discarded[rng.random(n) < 0.05] = True
    nw = np.maximum(lens - k + 1, 0)
    woff = np.concatenate([[0], np.cumsum(nw)])
    counts = rng.choice([0, 1, 2, 3, 5, 9, 20], size=int(nw.sum()),
                        p=[.2, .1, .2, .2, .15, .1, .05]).astype(np.int64)
    markup = np.where(rng.random(n) < 0.1,
                      rng.integers(1, lens + 1), 0).astype(np.int64)

    for scoring in ("MEDIAN", "SUM", "AVG", "MIN", "MAX"):
        a = _score_and_trim_scalar(rs, counts, woff, k, 2.0, scoring, markup)
        b = _score_and_trim_vectorized(rs, counts, woff, k, 2.0, scoring, markup)
        assert np.array_equal(a.offset, b.offset), scoring
        assert np.array_equal(a.length, b.length), scoring
        assert np.allclose(a.score, b.score), scoring
        assert a.label == b.label, scoring
