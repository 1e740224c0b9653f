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


@pytest.mark.parametrize("batch_reads,capacity", [(128, 65536), (333, 16384)])
def test_streaming_matches_host(batch_reads, capacity):
    from kmernator_tpu.io.stream import FastqBatchStream
    from kmernator_tpu.parallel.pipeline import build_streaming

    stream = FastqBatchStream([REF + "/1000.fastq"],
                              batch_reads=batch_reads)
    keys, counts = build_streaming(iter(stream), K, capacity, min_depth=2)
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
