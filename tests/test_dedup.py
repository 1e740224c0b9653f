"""Duplicate fragment filter semantics."""
import numpy as np

from kmernator_tpu.io.reads import ReadSet
from kmernator_tpu.ops.dedup import filter_duplicate_fragments


def make_pairs(frags, qual=35):
    rs = ReadSet()
    for i, (r1, r2) in enumerate(frags):
        rs.append_read(b"p%d/1" % i, b"", r1, np.full(len(r1), qual))
        rs.append_read(b"p%d/2" % i, b"", r2, np.full(len(r2), qual))
    rs.identify_pairs()
    return rs


def test_exact_duplicates_collapse():
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    r1 = bases[rng.integers(0, 4, 50)].tobytes()
    r2 = bases[rng.integers(0, 4, 50)].tobytes()
    other1 = bases[rng.integers(0, 4, 50)].tobytes()
    other2 = bases[rng.integers(0, 4, 50)].tobytes()
    rs = make_pairs([(r1, r2), (r1, r2), (r1, r2), (other1, other2)])
    n_before = rs.n
    affected = filter_duplicate_fragments(rs, dedup_length=24, mode=1)
    assert affected == 6  # 3 duplicate pairs affected
    # all 3 dup pairs discarded, consensus pair appended
    assert int(rs.discarded[:6].sum()) == 6
    assert not rs.discarded[6] and not rs.discarded[7]
    assert rs.n == n_before + 2
    assert rs.names[-2].startswith(b"C3-")
    assert rs.get_seq(rs.n - 2) == r1


def test_mode2_orientation_free():
    rng = np.random.default_rng(1)
    bases = np.frombuffer(b"ACGT", np.uint8)
    r1 = bases[rng.integers(0, 4, 50)].tobytes()
    r2 = bases[rng.integers(0, 4, 50)].tobytes()
    # second pair is the BA orientation of the first
    rs = make_pairs([(r1, r2), (r2, r1)])
    affected = filter_duplicate_fragments(rs, dedup_length=24, mode=2)
    assert affected == 4
    rs2 = make_pairs([(r1, r2), (r2, r1)])
    assert filter_duplicate_fragments(rs2, dedup_length=24, mode=1) == 0


def test_edit_distance_one_merges():
    rng = np.random.default_rng(2)
    bases = np.frombuffer(b"ACGT", np.uint8)
    r1 = bytearray(bases[rng.integers(0, 4, 50)].tobytes())
    r2 = bases[rng.integers(0, 4, 50)].tobytes()
    r1_mut = bytearray(r1)
    r1_mut[5] = ord("A") if r1_mut[5] != ord("A") else ord("C")
    rs = make_pairs([(bytes(r1), r2), (bytes(r1), r2), (bytes(r1_mut), r2)])
    # without edit distance: only the 2 exact dups collapse
    a0 = filter_duplicate_fragments(rs, dedup_length=24, mode=1, edit_distance=0)
    assert a0 == 4
    rs2 = make_pairs([(bytes(r1), r2), (bytes(r1), r2), (bytes(r1_mut), r2)])
    a1 = filter_duplicate_fragments(rs2, dedup_length=24, mode=1, edit_distance=1)
    assert a1 == 6
