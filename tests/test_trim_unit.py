"""Unit tests for trim/scoring semantics against hand-derived expectations
(transcribed from ReadSelector::trimReadByMinimumKmerScore + scoring types,
ref: src/ReadSelector.h:948-1180)."""
import numpy as np

from kmernator_tpu.io.reads import ReadSet
from kmernator_tpu.ops.trim import (ReadTrims, _longest_run,
                                    find_bimodal_partition, score_and_trim)


def make_rs(lengths):
    rs = ReadSet()
    for i, L in enumerate(lengths):
        rs.append_read(b"r%d" % i, b"", b"A" * L, np.full(L, 30))
    return rs


def run_one(counts, k=5, min_score=2.0, scoring="MEDIAN", L=None,
            markup_first=0, bimodal=-1.0):
    counts = np.asarray(counts, dtype=np.int64)
    L = L if L is not None else len(counts) + k - 1
    rs = make_rs([L])
    woff = np.array([0, len(counts)])
    trims = score_and_trim(rs, counts, woff, k, min_score, scoring,
                           np.array([markup_first]), bimodal)
    return trims


def test_longest_run_first_wins():
    assert _longest_run(np.array([1, 1, 0, 1, 1], bool)) == (0, 2)
    assert _longest_run(np.array([0, 1, 1, 1, 0, 1, 1], bool)) == (1, 3)
    # no run at all: best never replaces the (0,0) initial (the reference's
    # setTrimHeaders zeroes the offset for empty trims anyway)
    assert _longest_run(np.array([0, 0], bool)) == (0, 0)


def test_trim_and_median():
    # run of passing kmers [2,3,4] at offset 2; median = sorted[3//2]=3
    t = run_one([0, 1, 2, 3, 4, 0, 2], k=5)
    assert t.offset[0] == 2 and t.length[0] == 3 + 4  # +k-1
    assert t.score[0] == 3.0
    assert t.label[0] == b"Trim:2+7 MedianScore:3"


def test_untrimmed_label():
    t = run_one([5, 6, 7, 8], k=5)
    assert t.offset[0] == 0 and t.length[0] == 4 + 4
    assert t.label[0] == b"MedianScore:7"  # upper median of [5,6,7,8]


def test_all_fail():
    t = run_one([0, 1, 0], k=5)
    assert t.length[0] == 0 and t.score[0] == -1.0
    assert t.label[0] == b"Trim:0+0 MedianScore:0"  # int(-1+0.5) == 0


def test_scoring_types():
    counts = [3, 9, 6]
    assert run_one(counts, scoring="MAX").score[0] == 9.0
    assert run_one(counts, scoring="MIN").score[0] == 3.0
    assert run_one(counts, scoring="AVG").score[0] == 6.0
    # SUM is bug-compatible: run length, not the sum
    assert run_one(counts, scoring="SUM").score[0] == 3.0
    assert run_one(counts, scoring="MEDIAN").score[0] == 6.0


def test_markup_truncates_kmers():
    # first N at 1-based position 8, k=5 -> only 3 kmers considered
    t = run_one([5, 5, 5, 5, 5, 5], k=5, markup_first=8)
    assert t.length[0] == 3 + 4
    # all considered kmers pass -> wasTrimmed False -> no Trim label
    assert t.label[0] == b"MedianScore:5"


def test_bimodal_partition():
    vals = np.array([20.0, 21, 19, 20, 3, 2, 3, 2], np.float64)
    p, fm, sm = find_bimodal_partition(2.0, vals)
    assert p == 4 and fm > sm
    t = run_one([20, 21, 19, 20, 3, 2, 3, 2], k=5, bimodal=2.0)
    # second (weaker) partition removed; length = 4 kmers + k-1
    assert t.length[0] == 4 + 4
    assert t.label[0].startswith(b"Bimodal@9:20/2")
