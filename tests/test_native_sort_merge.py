"""Direct unit coverage for the round-4 native kernels: the sorted-run
spill path (radix_sort_kcw + merge_sum_runs) and the FASTQ parse
accelerators (find_newlines + gather_ragged_map).  The spill/streaming
integration tests exercise these indirectly; these pin the kernel
contracts against numpy oracles."""
import numpy as np
import pytest

from kmernator_tpu.io.native import (find_newlines, gather_ragged_map,
                                     get_lib, merge_sum_runs,
                                     radix_sort_kcw)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable")


def test_radix_sort_kcw_matches_argsort():
    rng = np.random.default_rng(11)
    k = rng.integers(0, 1 << 63, 200_000, dtype=np.uint64)
    # duplicate keys exercise stability of the payload pairing
    k[::7] = k[0]
    c = rng.integers(1, 1000, len(k)).astype(np.uint32)
    w = rng.random(len(k))
    o = np.argsort(k, kind="stable")
    k2, c2, w2 = k.copy(), c.copy(), w.copy()
    assert radix_sort_kcw(k2, c2, w2)
    assert np.array_equal(k2, k[o])
    assert np.array_equal(c2, c[o])
    assert np.array_equal(w2, w[o])
    # no-weights variant
    k3, c3 = k.copy(), c.copy()
    assert radix_sort_kcw(k3, c3)
    assert np.array_equal(k3, k[o]) and np.array_equal(c3, c[o])


def test_radix_sort_kcw_low_bit_keys_skip_passes():
    # keys confined to the low 16 bits: 3 of 4 digit passes are constant
    rng = np.random.default_rng(3)
    k = rng.integers(0, 1 << 16, 50_000, dtype=np.uint64)
    c = rng.integers(1, 5, len(k)).astype(np.uint32)
    o = np.argsort(k, kind="stable")
    k2, c2 = k.copy(), c.copy()
    assert radix_sort_kcw(k2, c2)
    assert np.array_equal(k2, k[o]) and np.array_equal(c2, c[o])


def _merge_oracle(runs, min_depth):
    ka = np.concatenate([r[0] for r in runs])
    ca = np.concatenate([r[1] for r in runs]).astype(np.int64)
    o = np.argsort(ka, kind="stable")
    ka, ca = ka[o], ca[o]
    b = np.concatenate([[True], ka[1:] != ka[:-1]])
    seg = np.cumsum(b) - 1
    cnt = np.bincount(seg, weights=ca).astype(np.int64)
    keep = cnt >= min_depth
    return ka[b][keep], cnt[keep]


@pytest.mark.parametrize("min_depth", [1, 2, 5])
def test_merge_sum_runs_matches_oracle(min_depth):
    rng = np.random.default_rng(min_depth)
    runs = []
    for r in range(5):
        u = np.unique(rng.integers(0, 4000, 2500, dtype=np.uint64))
        runs.append((u, rng.integers(1, 4, len(u)).astype(np.uint32), None))
    got = merge_sum_runs(runs, min_depth, False)
    assert got is not None
    exp_k, exp_c = _merge_oracle(runs, min_depth)
    assert np.array_equal(got[0], exp_k)
    assert np.array_equal(got[1], exp_c)


def test_merge_sum_runs_weighted():
    rng = np.random.default_rng(9)
    runs = []
    for r in range(3):
        u = np.unique(rng.integers(0, 500, 400, dtype=np.uint64))
        runs.append((u, np.ones(len(u), np.uint32),
                     rng.random(len(u)).astype(np.float64)))
    got = merge_sum_runs(runs, 1, True)
    assert got is not None
    ka = np.concatenate([r[0] for r in runs])
    wa = np.concatenate([r[2] for r in runs])
    o = np.argsort(ka, kind="stable")
    ka, wa = ka[o], wa[o]
    b = np.concatenate([[True], ka[1:] != ka[:-1]])
    seg = np.cumsum(b) - 1
    wsum = np.bincount(seg, weights=wa)
    assert np.array_equal(got[0], ka[b])
    assert np.allclose(got[2], wsum, rtol=1e-12)


def test_find_newlines_matches_flatnonzero():
    rng = np.random.default_rng(5)
    buf = rng.integers(0, 256, 300_000, dtype=np.uint8)
    got = find_newlines(buf)
    assert got is not None
    assert np.array_equal(got, np.flatnonzero(buf == 0x0a))
    # dense-newline retry path (cap refill)
    dense = np.full(100_000, 0x0a, dtype=np.uint8)
    got = find_newlines(dense)
    assert np.array_equal(got, np.arange(100_000))
    assert len(find_newlines(np.zeros(0, np.uint8))) == 0


def test_gather_ragged_map_matches_fancy_index():
    rng = np.random.default_rng(8)
    data = rng.integers(0, 256, 100_000, dtype=np.uint8)
    offs = np.sort(rng.integers(0, 90_000, 500)).astype(np.int64)
    lens = rng.integers(0, 64, 500).astype(np.int64)
    table = rng.permutation(256).astype(np.uint8)
    got = gather_ragged_map(data, offs, lens, table)
    assert got is not None
    exp = np.concatenate([table[data[o:o + n]] for o, n in zip(offs, lens)]) \
        if lens.sum() else np.zeros(0, np.uint8)
    assert np.array_equal(got, exp)
