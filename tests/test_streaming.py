"""Streaming spectrum build (FastqBatchStream -> StreamingSpectrum) must
reproduce the one-shot host spectrum: same unique keys, same counts,
regardless of batch size or staged-merge cadence."""
import numpy as np
import pytest

REF = "/root/reference/test"
K = 31


def host_table(min_depth):
    from kmernator_tpu.io.reads import load_reads
    from tests.test_device_spectrum import host_counts
    rs = load_reads([REF + "/1000.fastq"])
    sp = host_counts(rs, K, min_depth)[2]
    return dict(zip(sp.keys.tolist(), sp.counts.tolist()))


@pytest.mark.parametrize("batch_reads,capacity,mode",
                         [(128, 65536, "logp"), (333, 16384, "logp"),
                          (128, 65536, "raw_qual"), (128, 65536, "pack2")])
def test_streaming_matches_host(batch_reads, capacity, mode):
    from kmernator_tpu.io.stream import FastqBatchStream
    from kmernator_tpu.parallel.pipeline import build_streaming

    stream = FastqBatchStream([REF + "/1000.fastq"],
                              batch_reads=batch_reads,
                              raw_qual=(mode == "raw_qual"),
                              pack2=(mode == "pack2"))
    keys, counts = build_streaming(stream, K, capacity, min_depth=2)
    keys64 = (keys[:, 0].astype(np.uint64) << np.uint64(32)) | keys[:, 1]
    got = dict(zip(keys64.tolist(), counts.tolist()))
    want = host_table(2)
    assert got == want


def test_streaming_partitioned_union():
    """rank/size partitioned streams over the same file must cover every
    read exactly once (the multi-host input split)."""
    from kmernator_tpu.io.stream import FastqBatchStream

    whole = sum(int(l.sum()) for _, _, l in
                iter(FastqBatchStream([REF + "/1000.fastq"], batch_reads=256)))
    parts = 0
    for r in range(3):
        st = FastqBatchStream([REF + "/1000.fastq"], batch_reads=256,
                              rank=r, size=3)
        parts += sum(int(l.sum()) for _, _, l in iter(st))
    assert parts == whole


def test_streaming_singleton_purge_undercount_only():
    """With capacity below the unique-kmer count, singletons are purged
    under pressure (ref: KmerSpectrum.h periodic purge).  Purged-and-reseen
    kmers may undercount, but counts must never exceed the true count and
    reported keys must be a subset of the true table."""
    from kmernator_tpu.ops.kmer import extract_kmers_flat
    from kmernator_tpu.parallel.spectrum import pack_u64
    from kmernator_tpu.parallel.pipeline import StreamingSpectrum

    rng = np.random.default_rng(5)
    L, B = 64, 256
    genome = rng.integers(0, 4, 2000, dtype=np.uint8)
    batches = []
    for bi in range(12):
        codes = rng.integers(0, 4, (B, L), dtype=np.uint8)  # singleton soup
        # half the reads sample the genome (solid kmers)
        starts = rng.integers(0, 2000 - L, B // 2)
        codes[:B // 2] = genome[starts[:, None] + np.arange(L)[None, :]]
        batches.append(codes)

    true = {}
    for codes in batches:
        flat = codes.reshape(-1)
        offs = np.arange(0, (B + 1) * L, L)
        canon, _, _, _ = extract_kmers_flat(flat, offs, K)
        for kk in pack_u64(canon).tolist():
            true[kk] = true.get(kk, 0) + 1

    sp = StreamingSpectrum(K, capacity=8192)
    logp = np.full((B, L), np.float32(-0.000144), np.float32)
    lengths = np.full(B, L, np.int32)
    for codes in batches:
        sp.add_batch(codes, logp, lengths)
    keys, counts = sp.finalize(min_depth=2)
    assert sp.purged_singletons > 0
    keys64 = (keys[:, 0].astype(np.uint64) << np.uint64(32)) | keys[:, 1]
    assert len(keys64) > 0
    for kk, c in zip(keys64.tolist(), counts.tolist()):
        assert kk in true and c <= true[kk]
    # high-coverage kmers: undercount bounded by purge-resets (a purged
    # singleton reseen restarts at 1), never by more than a few
    got = dict(zip(keys64.tolist(), counts.tolist()))
    solid_true = [(kk, c) for kk, c in true.items() if c >= 12]
    assert len(solid_true) > 1000
    devs = [c - got.get(kk, 0) for kk, c in solid_true]
    assert all(0 <= d <= 5 for d in devs)
    assert sum(1 for d in devs if d == 0) >= 0.9 * len(devs)


def test_estimate_raw_kmers():
    from kmernator_tpu.io.stream import estimate_raw_kmers
    est = estimate_raw_kmers([REF + "/1000.fastq"], K)
    assert 40000 < est < 80000  # true: 1000 reads * 46 windows
