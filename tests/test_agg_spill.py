"""Aggregated spill counter (cross-chunk native aggregation with
flush-under-pressure) must produce byte-identical spectra to the
raw-record SpillCounter, for both weighted and unweighted tracking, at
any flush cadence — and the two record formats must merge when mixed in
one part dir (ref: spill-under-pressure build,
src/KmerSpectrum.h:1818-1902)."""
import tempfile

import numpy as np
import pytest

from kmernator_tpu.parallel.spill import (AggSpillCounter, SpillCounter,
                                          make_spill_counter)


@pytest.fixture(scope="module")
def obs():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 30000, 200000).astype(np.uint64) \
        * np.uint64(2654435761)
    good = rng.random(200000) < 0.9
    w = rng.random(200000).astype(np.float32)
    return keys, good, w


def _run(cls, track, obs, **kw):
    keys, good, w = obs
    sc = cls(31, 7, tmpdir=tempfile.mkdtemp(), track_weights=track, **kw)
    for s in range(0, len(keys), 37000):
        sc.add(keys[s:s + 37000], good[s:s + 37000], w[s:s + 37000])
    return sc.finalize(min_depth=2)


@pytest.mark.parametrize("track", [False, True])
@pytest.mark.parametrize("grow", [False, True])
def test_agg_matches_raw(track, grow, obs):
    a = _run(SpillCounter, track, obs)
    # tiny cap: with growth forbidden it's the flush-under-pressure path,
    # with growth allowed it's the adaptive-resize (insert_counted) path
    keys, good, w = obs
    b = AggSpillCounter(31, 7, tmpdir=tempfile.mkdtemp(),
                        track_weights=track, cap_slots=4096)
    if not grow:
        b._max_slots = 4096
    for s in range(0, len(keys), 37000):
        b.add(keys[s:s + 37000], good[s:s + 37000], w[s:s + 37000])
    if grow:
        assert b.agg.cap > 4096  # the resize actually happened
    bsp = b.finalize(min_depth=2)
    assert np.array_equal(a.keys, bsp.keys)
    assert np.array_equal(a.counts, bsp.counts)
    assert a.raw_kmers == bsp.raw_kmers
    assert a.raw_good_kmers == bsp.raw_good_kmers
    if track:
        assert np.allclose(a.weighted, bsp.weighted, rtol=1e-12)


def test_native_compact_good_matches_numpy():
    from kmernator_tpu.io.native import compact_good
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 1 << 62, 100001, dtype=np.uint64)
    good = rng.random(100001) < 0.4
    w = rng.random(100001).astype(np.float32)
    got = compact_good(keys, good, w)
    if got is None:
        pytest.skip("native lib unavailable")
    gk, gw, _, _ = got
    assert np.array_equal(gk, keys[good])
    assert np.array_equal(gw, w[good])
    gk2, gw2, _, _ = compact_good(keys, good, None)
    assert np.array_equal(gk2, keys[good])
    assert gw2 is None


def test_bucketed_insert_exact():
    """Regression for the (measured-negative, kept) radix-bucketed insert
    kernel: exact counts across flush cycles."""
    from kmernator_tpu.io.native import ObservationAggregator
    try:
        # >= 1<<19 slots so the kernel takes the bucketed path (>= 8
        # regions), not its small-table linear fallback
        agg = ObservationAggregator(1 << 19, False)
    except RuntimeError:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(4)
    want = {}
    for _ in range(4):
        keys = rng.integers(0, 120_000, 90_000, dtype=np.uint64)
        for k_, c_ in zip(*np.unique(keys, return_counts=True)):
            want[int(k_)] = want.get(int(k_), 0) + int(c_)
        gk = keys.copy()
        rem = agg.insert_bucketed(gk)
        while rem > 0:
            for k_, c_ in zip(*agg.export()[:2]):
                want[int(k_)] -= int(c_)
            rem = agg.insert_bucketed(gk[:rem])
        assert rem == 0
    for k_, c_ in zip(*agg.export()[:2]):
        want[int(k_)] -= int(c_)
    assert not any(want.values())


@pytest.mark.parametrize("track", [False, True])
def test_mixed_record_formats_merge(track, obs):
    """Raw and aggregated writers sharing one part dir (the k>32 fallback
    mixing with u64 workers can't happen in practice, but the finalize
    must not depend on it)."""
    keys, good, w = obs
    d = tempfile.mkdtemp()
    from kmernator_tpu.parallel.spill import key_range_splitters
    splits = key_range_splitters(keys[good][::16], 7)
    a = SpillCounter(31, 7, tmpdir=d, track_weights=track,
                     splitters=splits, suffix="raw")
    b = AggSpillCounter(31, 7, tmpdir=d, track_weights=track,
                        splitters=splits, suffix="agg", cap_slots=4096)
    h = len(keys) // 2
    a.add(keys[:h], good[:h], w[:h])
    b.add(keys[h:], good[h:], w[h:])
    a.close()
    b.close()
    from kmernator_tpu.parallel.spill import count_spill_parts
    sp = count_spill_parts(d, 7, 31, np.dtype(np.uint64), track, 2,
                           a.raw_kmers + b.raw_kmers,
                           a.raw_good_kmers + b.raw_good_kmers)
    ref = _run(SpillCounter, track, obs)
    assert np.array_equal(sp.keys, ref.keys)
    assert np.array_equal(sp.counts, ref.counts)
    if track:
        assert np.allclose(sp.weighted, ref.weighted, rtol=1e-12)


def test_factory_picks_agg_for_u64():
    sc = make_spill_counter(31, 4, tmpdir=tempfile.mkdtemp())
    try:
        assert isinstance(sc, AggSpillCounter)
    finally:
        sc.close()
    sc = make_spill_counter(95, 4, tmpdir=tempfile.mkdtemp())
    try:
        assert isinstance(sc, SpillCounter)
    finally:
        sc.close()


def test_shared_cas_table_exact_multiprocess():
    """The (measured-negative, opt-in) shared CAS count table: exact
    counts across concurrent fork workers, pressure prefix honored."""
    import multiprocessing as mp
    from kmernator_tpu.io.native import SharedCountTable
    try:
        t = SharedCountTable(1 << 18)
    except RuntimeError:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(6)
    batches = [rng.integers(0, 60_000, 80_000, dtype=np.uint64)
               for _ in range(4)]
    _SHCT_STATE["t"] = t
    _SHCT_STATE["batches"] = batches
    ctx = mp.get_context("fork")
    with ctx.Pool(4) as pool:
        consumed = pool.map(_shct_worker, range(4))
    assert consumed == [80_000] * 4
    ko, co = t.export()
    want = {}
    for b in batches:
        for k_, c_ in zip(*np.unique(b, return_counts=True)):
            want[int(k_)] = want.get(int(k_), 0) + int(c_)
    got = dict(zip(ko.tolist(), co.tolist()))
    assert got == want
    # pressure: a too-small table consumes only a prefix
    t2 = SharedCountTable(1 << 14)
    big = rng.integers(0, 1 << 60, 50_000, dtype=np.uint64)
    c = t2.insert(big)
    assert 0 < c < 50_000
    t.close()
    t2.close()


_SHCT_STATE = {}


def _shct_worker(i):
    return _SHCT_STATE["t"].insert(_SHCT_STATE["batches"][i])
