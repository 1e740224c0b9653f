"""Window-weight recurrence must match a scalar port of the reference loop
(ref: src/KmerReadUtils.h:201-219)."""
import numpy as np

from kmernator_tpu.ops.weights import window_weights, phred_probability


def scalar_weights(p, markpos, k):
    """Direct scalar transcription of the reference recurrence semantics."""
    n = len(p) - k + 1
    out = np.zeros(max(n, 0), dtype=np.float64)
    weight = 0.0
    marks = sorted(markpos)
    mi = 0
    for i in range(n):
        if i % 1024 == 0 or weight == 0.0:
            weight = 1.0
            for j in range(k):
                weight *= p[i + j]
        else:
            change = p[i + k - 1] / p[i - 1]
            weight *= change
        while mi < len(marks) and marks[mi] < i:
            mi += 1
        if mi < len(marks) and marks[mi] < i + k:
            weight = 0.0
        out[i] = weight
    return out


def _run_case(rng, L, k, zero_frac, mark_frac):
    p = 1.0 - np.power(10.0, -rng.integers(2, 41, L) / 10.0)
    zmask = rng.random(L) < zero_frac
    p[zmask] = 0.0
    markup = rng.random(L) < mark_frac
    offsets = np.array([0, L], np.int64)
    got = window_weights(p, offsets, markup, k)
    want = scalar_weights(p, np.flatnonzero(markup), k)
    assert np.array_equal(got, want), (got[:20], want[:20])


def test_matches_scalar_reference():
    rng = np.random.default_rng(42)
    for L, k in [(76, 31), (76, 21), (200, 31), (2100, 31), (50, 31), (31, 31)]:
        for zf, mf in [(0.0, 0.0), (0.05, 0.0), (0.0, 0.05), (0.1, 0.1)]:
            _run_case(rng, L, k, zf, mf)


def test_multiple_reads_flat():
    rng = np.random.default_rng(1)
    k = 31
    lens = [76, 76, 40, 150, 31, 30]
    p = np.concatenate([1.0 - np.power(10.0, -rng.integers(0, 41, L) / 10.0) for L in lens])
    p[rng.random(len(p)) < 0.05] = 0.0
    markup = rng.random(len(p)) < 0.03
    offsets = np.concatenate([[0], np.cumsum(lens)])
    got = window_weights(p, offsets, markup, k)
    parts = []
    for i, L in enumerate(lens):
        s, e = offsets[i], offsets[i + 1]
        parts.append(scalar_weights(p[s:e], np.flatnonzero(markup[s:e]), k))
    want = np.concatenate(parts)
    assert np.array_equal(got, want)


def test_phred_probability_table():
    # mirror of initializeQualityToProbability for both bases
    for base in (33, 64):
        q = np.arange(0, 80)
        p = phred_probability(q, 3, base)
        for i, qi in enumerate(q):
            ch = qi + base
            if ch < base + 3:
                assert p[i] == 0.0
            elif ch >= 103:
                assert p[i] == 1.0
            else:
                assert p[i] == 1.0 - 10.0 ** (-(qi) / 10.0)
