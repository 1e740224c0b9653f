"""Vectorized variant purge vs a sequential oracle (the reference
algorithm, ref: src/KmerSpectrum.h:2117-2235): batch hamming-shell
resolution + the purged-sources-don't-purge fixpoint must equal
descending-order sequential processing, including the reference's
`20 ^ d` XOR quirk."""
import numpy as np
import pytest

K = 21


def _random_spectrum(rng, n_sources=12, n_variants_per=6, n_noise=500,
                     chain=False):
    """Synthetic spectrum: big sources, small hamming-1/2 variants, noise."""
    from kmernator_tpu.ops.kmer import extract_kmers_flat, nwords, \
        revcomp_words, words_less
    from kmernator_tpu.parallel.spectrum import (KmerSpectrum, pack_keys,
                                                 unpack_keys)
    W = nwords(K)
    codes = rng.integers(0, 4, (64, 80), dtype=np.uint8)
    offs = np.arange(0, 65 * 80, 80)
    canon, _, _, _ = extract_kmers_flat(codes.reshape(-1), offs, K)
    pool = np.unique(pack_keys(canon))
    rng.shuffle(pool)
    keys = {}

    def canon_of(words):
        rc = revcomp_words(np, words, K)
        less = words_less(np, rc, words)
        return np.where(less[:, None], rc, words)

    def add(key, count):
        keys[int(key)] = keys.get(int(key), 0) + count

    srcs = pool[:n_sources]
    for i, sk in enumerate(srcs):
        add(sk, int(rng.integers(600, 5000)))
        words = unpack_keys(np.array([sk], np.uint64), W)
        for v in range(n_variants_per):
            p = int(rng.integers(0, K))
            w, o = divmod(p, 16)
            shift = np.uint32(30 - 2 * o)
            nb = np.uint32(rng.integers(0, 4))
            mut = words.copy()
            mut[0, w] = (mut[0, w] & ~(np.uint32(3) << shift)) | (nb << shift)
            nk = pack_keys(canon_of(mut))[0]
            if chain and v == 0:
                add(nk, int(rng.integers(600, 900)))   # variant is a source
            else:
                add(nk, int(rng.integers(1, 60)))
    for nk in pool[n_sources:n_sources + n_noise]:
        add(nk, int(rng.integers(1, 200)))
    sk = np.array(sorted(keys), np.uint64)
    sp = KmerSpectrum(k=K)
    sp.keys = sk
    sp.counts = np.array([keys[int(x)] for x in sk], np.int64)
    return sp


def _sequential_oracle(sp, sigmas, edit_distance, min_var):
    """Descending-order sequential purge (the round-1 implementation with
    purged sources skipped, not aborted)."""
    from kmernator_tpu.ops.kmer import nwords
    from kmernator_tpu.parallel.spectrum import (_hamming1_canonical,
                                                 unpack_keys)
    vals = sp.counts.astype(np.float64).copy()
    value_map = {int(k): i for i, k in enumerate(sp.keys)}
    W = nwords(sp.k)
    order = np.argsort(-vals, kind="stable")
    purged = set()
    for si in order:
        if si in purged:
            continue
        v = vals[si]
        if v <= min_var:
            break
        thr_base = v - np.sqrt(v) * sigmas
        d = edit_distance
        while d > 1:
            if v > min_var * (20 ^ d):
                break
            d -= 1
        words = unpack_keys(sp.keys[si:si + 1], W)
        neighbors = _hamming1_canonical(words, sp.k)
        for dist in range(1, d + 1):
            thr = thr_base / (20 ^ (dist - 1))
            for nk in neighbors:
                j = value_map.get(int(nk))
                if j is not None and 0.0 < vals[j] < thr:
                    vals[j] = 0.0
                    purged.add(j)
            if dist < d:
                words_n = unpack_keys(np.asarray(neighbors), W)
                nxt = {int(x) for row in range(len(words_n))
                       for x in _hamming1_canonical(words_n[row:row + 1],
                                                    sp.k)}
                neighbors = np.array(sorted(nxt), np.uint64)
    return purged


@pytest.mark.parametrize("seed,chain,ed", [(0, False, 1), (1, False, 2),
                                           (2, True, 2), (3, True, 1)])
def test_vectorized_purge_matches_sequential(seed, chain, ed):
    rng = np.random.default_rng(seed)
    sp = _random_spectrum(rng, chain=chain)
    sp2 = type(sp)(k=sp.k)
    sp2.keys = sp.keys.copy()
    sp2.counts = sp.counts.copy()
    want = _sequential_oracle(sp, 2.0, ed, 512.0)
    want_keys = set(int(sp.keys[j]) for j in want)
    n = sp2.purge_variants(2.0, edit_distance=ed,
                           min_variant_kmer_depth=512.0,
                           use_weighted=False, min_depth=1)
    assert n == len(want)
    surviving = set(int(x) for x in sp2.keys)
    assert surviving == set(int(x) for x in sp.keys) - want_keys


def test_purge_basic_semantics():
    """A strong kmer purges its rare hamming-1 neighbor; an abundant
    neighbor survives."""
    from kmernator_tpu.parallel.spectrum import KmerSpectrum, pack_keys, \
        unpack_keys, _hamming1_canonical
    from kmernator_tpu.ops.kmer import nwords
    rng = np.random.default_rng(4)
    sp = _random_spectrum(rng, n_sources=3, n_variants_per=4, n_noise=0)
    before = dict(zip(sp.keys.tolist(), sp.counts.tolist()))
    n = sp.purge_variants(2.0, edit_distance=2,
                          min_variant_kmer_depth=512.0,
                          use_weighted=False, min_depth=1)
    assert n > 0
    after = dict(zip(sp.keys.tolist(), sp.counts.tolist()))
    # all sources survive
    for kk, c in before.items():
        if c > 512:
            assert kk in after


def test_purge_speed_large():
    """10^6-key spectrum with 2000 sources purges in seconds, not minutes
    (the VERDICT weak-#4 criterion)."""
    import time
    from kmernator_tpu.ops.kmer import extract_kmers_flat
    from kmernator_tpu.parallel.spectrum import KmerSpectrum, pack_keys
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, (1 << 14, 80), dtype=np.uint8)
    offs = np.arange(0, ((1 << 14) + 1) * 80, 80)
    canon, _, _, _ = extract_kmers_flat(codes.reshape(-1), offs, K)
    keys = np.unique(pack_keys(canon))
    counts = rng.integers(1, 100, len(keys)).astype(np.int64)
    counts[rng.integers(0, len(keys), 2000)] = 5000
    sp = KmerSpectrum(k=K)
    sp.keys = keys
    sp.counts = counts
    t0 = time.time()
    sp.purge_variants(2.0, edit_distance=2, min_variant_kmer_depth=512.0,
                      use_weighted=False, min_depth=1)
    dt = time.time() - t0
    assert dt < 30.0, dt


@pytest.mark.parametrize("n_devices,ed", [(1, 2), (4, 1), (8, 2)])
def test_mesh_purge_matches_host(n_devices, ed):
    """Fully on-mesh variant purge (all_to_all candidate routing, no host
    table materialization) equals the host KmerSpectrum.purge_variants on
    the same table (ref: src/DistributedFunctions.h:607-747)."""
    from kmernator_tpu.ops.kmer import nwords
    from kmernator_tpu.parallel.mesh import make_mesh
    from kmernator_tpu.parallel.mesh_stream import MeshStreamingSpectrum
    from kmernator_tpu.parallel.spectrum import pack_keys, unpack_keys

    rng = np.random.default_rng(17 + n_devices)
    sp = _random_spectrum(rng, chain=True)
    W = nwords(K)

    mesh = make_mesh(n_devices)
    ms = MeshStreamingSpectrum(mesh, K, capacity=4096)
    ms.set_table(unpack_keys(sp.keys, W), sp.counts.astype(np.int32))
    purged_mesh = ms.purge_variants_mesh(2.0, ed, 512.0, min_depth=2)
    got_keys, got_counts = ms.finalize(min_depth=2)

    purged_host = sp.purge_variants(2.0, ed, 512.0, min_depth=2)
    assert purged_mesh == purged_host
    assert np.array_equal(pack_keys(got_keys), sp.keys)
    assert np.array_equal(got_counts, sp.counts)
