"""Native kmer_observe kernel == numpy oracle, bit for bit (keys AND
float64 weights), across ragged reads, markup bases, zero-probability
bases, and the 1024-window resync boundary."""
import numpy as np
import pytest

from kmernator_tpu.io.native import kmer_observe
from kmernator_tpu.ops.kmer import extract_kmers_flat
from kmernator_tpu.ops.weights import window_weights, phred_probability
from kmernator_tpu.parallel.spectrum import pack_keys


def _oracle(codes, markup, p, offsets, k):
    canon, _, _, _ = extract_kmers_flat(codes, offsets, k)
    return pack_keys(canon), window_weights(p, offsets, markup, k)


@pytest.mark.parametrize("k", [5, 16, 17, 31, 32])
def test_native_observe_matches_numpy(k):
    if kmer_observe(np.zeros(0, np.uint8), np.zeros(0, np.uint8),
                    np.zeros(0), np.array([0], np.int64), k) is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    lens = np.concatenate([
        rng.integers(1, 200, 60),        # short/ragged (some < k)
        [1500, 2600],                    # cross the 1024-window resync
    ]).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    total = int(offsets[-1])
    codes = rng.integers(0, 4, total).astype(np.uint8)
    markup = rng.random(total) < 0.01
    codes[markup] = 0
    phred = rng.integers(0, 41, total)
    phred[rng.random(total) < 0.05] = 1   # below min_quality -> p == 0.0
    p = phred_probability(phred, 3, 33)
    ok, ow = _oracle(codes, markup.astype(np.uint8).astype(bool), p,
                     offsets, k)
    res = kmer_observe(codes, markup, p, offsets, k)
    assert res is not None
    nk, nw = res
    assert np.array_equal(ok, nk)
    # weights must be IDENTICAL doubles (the spectrum discard threshold
    # compares float32 casts; bit equality makes that trivially safe)
    assert np.array_equal(ow.view(np.int64), nw.view(np.int64))


def test_native_observe_wide_k_falls_back():
    assert kmer_observe(np.zeros(4, np.uint8), np.zeros(4, np.uint8),
                        np.ones(4), np.array([0, 4], np.int64), 33) is None


@pytest.mark.parametrize("k", [7, 31, 32])
def test_native_keys_matches_numpy(k):
    from kmernator_tpu.io.native import kmer_keys
    rng = np.random.default_rng(9)
    lens = rng.integers(1, 300, 80).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    codes = rng.integers(0, 4, int(offsets[-1])).astype(np.uint8)
    nk = kmer_keys(codes, offsets, k)
    if nk is None:
        pytest.skip("native lib unavailable")
    canon, _, _, _ = extract_kmers_flat(codes, offsets, k)
    assert np.array_equal(pack_keys(canon), nk)


def test_native_hash_lookup_matches_searchsorted():
    from kmernator_tpu.io.native import make_hash
    rng = np.random.default_rng(17)
    keys = np.unique(rng.integers(0, 1 << 62, 50000).astype(np.uint64)) << 2
    counts = rng.integers(1, 1000, len(keys)).astype(np.int64)
    ht = make_hash(keys, counts)
    if ht is None:
        pytest.skip("native lib unavailable")
    q = np.concatenate([keys[rng.integers(0, len(keys), 30000)],
                        rng.integers(0, 1 << 62, 30000).astype(np.uint64) << 2])
    rng.shuffle(q)
    idx = np.clip(np.searchsorted(keys, q), 0, len(keys) - 1)
    want = np.where(keys[idx] == q, counts[idx], 0)
    assert np.array_equal(ht.lookup(q), want)


def test_scan_all_native_equals_fallback(monkeypatch):
    """ArtifactFilter.scan_all native kernels == pure-numpy fallback."""
    from kmernator_tpu.io.reads import ReadSet
    from kmernator_tpu.ops.artifact import ArtifactFilter
    from kmernator_tpu.io import native as native_mod
    if native_mod.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(23)
    bases = np.frombuffer(b"ACGT", np.uint8)
    rs = ReadSet()
    names, comments, seqs, quals = [], [], [], []
    for i in range(200):
        L = int(rng.integers(5, 130))
        names.append(b"q%d" % i)
        comments.append(b"")
        seqs.append(bases[rng.integers(0, 4, L)].tobytes())
        quals.append(rng.integers(0, 41, L).astype(np.int16))
    rs.append_reads_batch(names, comments, seqs, quals)
    rs.has_quals[::7] = False
    filt = ArtifactFilter(edit_distance=1, min_quality=5, min_read_length=0.5)
    got_native = filt.scan_all(rs)
    monkeypatch.setattr(native_mod, "quality_runs",
                        lambda *a, **kw: None)
    monkeypatch.setattr(native_mod, "artifact_keys",
                        lambda *a, **kw: None)
    got_np = filt.scan_all(rs)
    for a, b in zip(got_native, got_np):
        assert np.array_equal(a, b)


def test_quality_runs_second_best_tie_matches_scalar():
    """Regression: runs [1,1,3] — the reference's online swap keeps the
    SECOND unit run as second-best (the demoted ex-best ties and loses),
    ref: applyFilterToRead :407-442."""
    from kmernator_tpu.io.reads import ReadSet
    from kmernator_tpu.ops.artifact import ArtifactFilter
    from kmernator_tpu.io import native as native_mod
    # q>=5 pattern: G . G . GGG  (runs of len 1 at 0, 2; len 3 at 4)
    ph = np.array([9, 1, 9, 1, 9, 9, 9], dtype=np.int16)
    rs = ReadSet()
    rs.append_reads_batch([b"r"], [b""], [b"ACGTACG"], [ph])
    filt = ArtifactFilter(min_quality=5, min_read_length=0.5)
    v, mn, mx, so, sl, wp = filt.scan_all(rs)
    _, _, _, sec, _ = filt._scan_read(rs, 0)
    assert (so[0], so[0] + sl[0]) == sec == (2, 3)
    if native_mod.get_lib() is not None:
        qr = native_mod.quality_runs(ph, np.ones(1, bool),
                                     np.array([0, 7], np.int64), 5)
        assert (qr[2][0], qr[3][0]) == (2, 1)


def test_native_spill_count_matches_numpy():
    from kmernator_tpu.io.native import spill_count
    rng = np.random.default_rng(31)
    keys = rng.integers(0, 5000, 200000).astype(np.uint64) << 2
    for md in (1, 2, 5):
        res = spill_count(keys, md)
        if res is None:
            pytest.skip("native lib unavailable")
        uk, cnt = np.unique(keys, return_counts=True)
        keep = cnt >= md
        assert np.array_equal(res[0], uk[keep])
        assert np.array_equal(res[1], cnt[keep].astype(np.int32))


@pytest.mark.parametrize("stype", ["MEDIAN", "MIN", "MAX", "SUM"])
def test_native_score_trim_matches_numpy(stype):
    from kmernator_tpu.io.native import score_trim
    from kmernator_tpu.ops.trim import _vectorized_runs, _vectorized_scores
    rng = np.random.default_rng(41)
    n = 500
    nw = rng.integers(0, 60, n).astype(np.int64)
    woff = np.concatenate([[0], np.cumsum(nw)]).astype(np.int64)
    counts = rng.integers(0, 6, int(woff[-1])).astype(np.int64)
    nk = np.minimum(nw, rng.integers(0, 70, n))
    res = score_trim(counts, woff, nk, 2.0, stype)
    if res is None:
        pytest.skip("native lib unavailable")
    NW = int(nw.max())
    c2 = np.zeros((n, NW), np.int64)
    rows = np.repeat(np.arange(n), nw)
    cols = np.arange(int(nw.sum())) - np.repeat(woff[:-1], nw)
    c2[rows, cols] = counts
    off, length = _vectorized_runs(c2, nk, 2.0)
    sc = _vectorized_scores(c2, off, length, stype)
    assert np.array_equal(res[0], off)
    assert np.array_equal(res[1], length)
    assert np.array_equal(res[2], sc)


def test_native_format_fastq_matches_numpy(monkeypatch):
    """format_reads_batch native assembly == numpy fallback bytes."""
    from kmernator_tpu.io.reads import ReadSet, format_reads_batch
    from kmernator_tpu.io import native as native_mod
    if native_mod.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(51)
    bases = np.frombuffer(b"ACGT", np.uint8)
    rs = ReadSet()
    names, comments, seqs, quals = [], [], [], []
    for i in range(300):
        L = int(rng.integers(1, 90))
        names.append(b"f%d" % i)
        comments.append(b"c%d" % i if i % 3 else b"")
        seqs.append(bases[rng.integers(0, 4, L)].tobytes())
        quals.append(rng.integers(0, 41, L).astype(np.int16))
    rs.append_reads_batch(names, comments, seqs, quals)
    rs.has_quals[::5] = False
    rs.discarded[::11] = True
    idxs = np.arange(rs.n, dtype=np.int64)
    toff = rng.integers(0, 5, rs.n).astype(np.int64)
    tlen = rng.integers(0, 120, rs.n).astype(np.int64)
    labels = [b"L%d" % i if i % 2 else b"" for i in range(rs.n)]
    for fmt in (0, 1):
        got = format_reads_batch(rs, idxs, labels, toff, tlen, fmt, 33)
        monkeypatch.setattr(native_mod, "format_fastq",
                            lambda *a, **kw: None)
        want = format_reads_batch(rs, idxs, labels, toff, tlen, fmt, 33)
        monkeypatch.undo()
        assert got == want


def test_native_gather_ragged_matches_numpy():
    from kmernator_tpu.io.native import gather_ragged
    rng = np.random.default_rng(61)
    data = rng.integers(0, 256, 50000).astype(np.uint8)
    lens = rng.integers(0, 200, 300).astype(np.int64)
    offs = rng.integers(0, 49800, 300).astype(np.int64)
    got = gather_ragged(data, offs, lens)
    if got is None:
        pytest.skip("native lib unavailable")
    want = np.concatenate([data[o:o + l] for o, l in zip(offs, lens)]) \
        if lens.sum() else np.zeros(0, np.uint8)
    assert np.array_equal(got, want)
