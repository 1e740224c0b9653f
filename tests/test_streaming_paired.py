"""Paired two-file (R1/R2) streaming: record-lockstep chunking, mate-tail
handling, and end-to-end byte-identity of BOTH output modes (merged and
--separate-outputs) against the in-memory path (VERDICT r4 missing-#1 /
weak-#3).  Reference semantics: two-file mate streaming with pair-
preserving resync (src/ReadSet.cpp:186-218, src/ReadFileReader.h:657-740)
and file-sequential merged output (src/ReadSelector.h:1212-1262)."""
import os
import subprocess
import sys

import pytest

REF = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")


def _split_pair(tmp_path, copies=8, extra_mates=0):
    """Split the interleaved golden input into positional R1/R2 files,
    tiled `copies` times with unique name prefixes so the pair files are
    multi-chunk at test chunk sizes.  extra_mates appends unpaired tail
    records to R2 (the mate-file-longer layout)."""
    lines = open(REF + "/10-cs18.std.fastq", "rb").read().decode().splitlines()
    recs = ["\n".join(lines[i:i + 4]) for i in range(0, len(lines), 4)]
    r1, r2 = [], []
    for c in range(copies):
        for j, rec in enumerate(recs):
            parts = rec.split("\n")
            parts[0] = "@cp%03d_%s" % (c, parts[0][1:])
            (r1 if j % 2 == 0 else r2).append("\n".join(parts))
    for x in range(extra_mates):
        parts = recs[1].split("\n")
        parts[0] = "@tail%03d_%s" % (x, parts[0][1:])
        r2.append("\n".join(parts))
    p1 = str(tmp_path / "r1.fastq")
    p2 = str(tmp_path / "r2.fastq")
    with open(p1, "w") as f:
        f.write("\n".join(r1) + "\n")
    with open(p2, "w") as f:
        f.write("\n".join(r2) + "\n")
    return p1, p2


def _records(path, start=0, end=None):
    data = open(path, "rb").read()
    sl = data[start:end if end is not None else len(data)]
    n = sl.count(b"\n")
    assert n % 4 == 0, "slice not record-aligned"
    return n // 4


def test_paired_chunk_ranges_lockstep(tmp_path):
    """Chunk i of both files holds the SAME record count (the lockstep
    invariant), ranges tile each file exactly, and every boundary is
    record-aligned."""
    from kmernator_tpu.io.chunked import paired_chunk_ranges
    p1, p2 = _split_pair(tmp_path)
    ranges = paired_chunk_ranges(p1, p2, 4 << 10)
    assert len(ranges) > 3, "want a multi-chunk layout for this test"
    pos1 = pos2 = 0
    for s1, e1, s2, e2 in ranges:
        assert (s1, s2) == (pos1, pos2), "ranges must tile both files"
        assert _records(p1, s1, e1) == _records(p2, s2, e2)
        pos1, pos2 = e1, e2
    assert pos1 == os.path.getsize(p1)
    assert pos2 == os.path.getsize(p2)


def test_paired_chunk_ranges_mate_tail(tmp_path):
    """A longer mate file yields a final tail range with zero file-1
    bytes holding exactly the surplus records."""
    from kmernator_tpu.io.chunked import paired_chunk_ranges
    p1, p2 = _split_pair(tmp_path, copies=2, extra_mates=3)
    ranges = paired_chunk_ranges(p1, p2, 4 << 10)
    s1, e1, s2, e2 = ranges[-1]
    assert s1 == e1 == os.path.getsize(p1)
    assert e2 == os.path.getsize(p2)
    assert _records(p2, s2, e2) == 3
    for s1, e1, s2, e2 in ranges[:-1]:
        assert _records(p1, s1, e1) == _records(p2, s2, e2)


def test_paired_chunk_ranges_mate_ends_early(tmp_path):
    """A SHORTER mate file is a hard error naming the shortfall."""
    from kmernator_tpu.io.chunked import paired_chunk_ranges
    p1, p2 = _split_pair(tmp_path, copies=2)
    data = open(p2, "rb").read().decode().splitlines()
    with open(p2, "w") as f:  # drop the last 2 records of R2
        f.write("\n".join(data[:-8]) + "\n")
    with pytest.raises(ValueError, match="mate file ends"):
        paired_chunk_ranges(p1, p2, 4 << 10)


def test_stream_paired_readsets_mates_share_chunks(tmp_path):
    """Every chunk pairs fully within itself: identify_pairs matches each
    file-1 read to its mate, and the total equals both files."""
    from kmernator_tpu.io.chunked import stream_paired_readsets
    p1, p2 = _split_pair(tmp_path)
    total = 0
    chunks = 0
    for rs in stream_paired_readsets([p1, p2], 4 << 10):
        chunks += 1
        total += rs.n
        rs.identify_pairs()
        paired = sum(1 for a, b in rs.pairs if a >= 0 and b >= 0)
        assert paired == rs.n // 2, "all mates must pair inside the chunk"
    assert chunks > 3
    assert total == _records(p1) + _records(p2)


def _run_filter(inputs, out, extra, env=None):
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--jax-platform", "cpu", "--min-read-length", "25",
           "--out", out] + extra + ["21"] + inputs
    return subprocess.run(cmd, check=True, env=env or ENV,
                          capture_output=True)


@pytest.mark.parametrize("threads", [1, 3])
def test_paired_twofile_streaming_merged_matches_inmemory(tmp_path, threads):
    """Two-file --streaming with MERGED output (--separate-outputs 0) ==
    the in-memory path, byte for byte (the part streams concatenate
    file-sequentially at close), with both the sequential engine and the
    worker pool."""
    p1, p2 = _split_pair(tmp_path)
    mem = str(tmp_path / "mem")
    st = str(tmp_path / "st")
    _run_filter([p1, p2], mem, ["--separate-outputs", "0"])
    _run_filter([p1, p2], st,
                ["--separate-outputs", "0",
                 "--streaming", "--threads", str(threads),
                 "--streaming-chunk-mb", "0.004", "--streaming-parts", "3"])
    a = open(mem, "rb").read()
    b = open(st, "rb").read()
    assert len(a) > 1000
    assert a == b
    assert not [f for f in os.listdir(str(tmp_path)) if ".part" in f], \
        "part-stream temp files must be cleaned up"


@pytest.mark.parametrize("threads", [1, 3])
def test_paired_twofile_streaming_separate_matches_inmemory(tmp_path,
                                                            threads):
    """Default --separate-outputs: per-file outputs byte-identical too."""
    p1, p2 = _split_pair(tmp_path)
    _run_filter([p1, p2], str(tmp_path / "mem"), [])
    _run_filter([p1, p2], str(tmp_path / "st"),
                ["--streaming", "--threads", str(threads),
                 "--streaming-chunk-mb", "0.004", "--streaming-parts", "3"])
    got = 0
    for fn in ("-MinDepth2-r1.fastq", "-MinDepth2-r2.fastq"):
        a = open(str(tmp_path / ("mem" + fn)), "rb").read()
        b = open(str(tmp_path / ("st" + fn)), "rb").read()
        assert a == b and len(a) > 500
        got += 1
    assert got == 2


@pytest.mark.parametrize("merged", [False, True])
def test_paired_auto_engage_default_flags(tmp_path, merged):
    """A paired two-file input over the auto-stream threshold engages the
    lockstep streaming engine WITHOUT --streaming — in both output modes,
    including merged, which used to hard-error — and still matches the
    in-memory bytes (VERDICT r4 #2 'done' criterion, threshold shrunk
    via KMTPU_AUTO_STREAM_MB)."""
    p1, p2 = _split_pair(tmp_path)
    flags = ["--separate-outputs", "0"] if merged else []
    env_mem = dict(ENV, KMTPU_AUTO_STREAM_MB="999999")
    env_auto = dict(ENV, KMTPU_AUTO_STREAM_MB="0")
    _run_filter([p1, p2], str(tmp_path / "mem"), flags, env=env_mem)
    r = _run_filter([p1, p2], str(tmp_path / "auto"),
                    flags + ["--verbose", "1"], env=env_auto)
    assert b"two-file lockstep mode" in r.stderr
    names = [""] if merged else ["-MinDepth2-r1.fastq", "-MinDepth2-r2.fastq"]
    for fn in names:
        a = open(str(tmp_path / ("mem" + fn)), "rb").read()
        b = open(str(tmp_path / ("auto" + fn)), "rb").read()
        assert a == b and len(a) > 500


def test_unaligned_two_files_do_not_engage_paired_mode(tmp_path):
    """Name-scrambled two-file inputs stay on the independent-inputs
    streaming path (with a warning), not the lockstep pair path."""
    p1, p2 = _split_pair(tmp_path, copies=2)
    lines = open(p2, "rb").read().decode().splitlines()
    recs = ["\n".join(lines[i:i + 4]) for i in range(0, len(lines), 4)]
    with open(p2, "w") as f:  # reverse record order: heads no longer pair
        f.write("\n".join(recs[::-1]) + "\n")
    r = _run_filter([p1, p2], str(tmp_path / "o"),
                    ["--streaming", "--streaming-chunk-mb", "0.004"])
    assert b"do not pair positionally" in r.stderr


def test_reference_pair_files_streaming_matches_inmemory(tmp_path):
    """The reference's OWN two-file mate pair (10-cs18.1/.2.fastq, casava
    comments, 'N' bases — the files its ReadSetTest pairs by name,
    ref: test/ReadSetTest.cpp) through two-file lockstep streaming:
    byte-identical to the in-memory path in both output modes.  Tiled so
    the pair spans multiple chunks."""
    lines1 = open(REF + "/10-cs18.1.fastq", "rb").read().decode().splitlines()
    lines2 = open(REF + "/10-cs18.2.fastq", "rb").read().decode().splitlines()
    p1, p2 = str(tmp_path / "r1.fastq"), str(tmp_path / "r2.fastq")
    for path, lines in ((p1, lines1), (p2, lines2)):
        recs = ["\n".join(lines[i:i + 4]) for i in range(0, len(lines), 4)]
        out = []
        for c in range(10):
            for rec in recs:
                parts = rec.split("\n")
                parts[0] = "@t%02d_%s" % (c, parts[0][1:])
                out.append("\n".join(parts))
        with open(path, "w") as f:
            f.write("\n".join(out) + "\n")
    for mode in ([], ["--separate-outputs", "0"]):
        tag = "m" if mode else "s"
        _run_filter([p1, p2], str(tmp_path / ("mem" + tag)), mode)
        _run_filter([p1, p2], str(tmp_path / ("st" + tag)), mode +
                    ["--streaming", "--threads", "2",
                     "--streaming-chunk-mb", "0.004"])
        names = [""] if mode else ["-MinDepth2-r1.fastq",
                                   "-MinDepth2-r2.fastq"]
        for fn in names:
            a = open(str(tmp_path / ("mem" + tag + fn)), "rb").read()
            b = open(str(tmp_path / ("st" + tag + fn)), "rb").read()
            assert a == b and len(a) > 200, (mode, fn)


def test_paired_twofile_streaming_mesh(tmp_path):
    """Two-file lockstep streaming through the DEVICE mesh engine
    (--streaming --mesh): the sequential chunk source feeds the sharded
    spectrum and both output modes still match the in-memory path."""
    p1, p2 = _split_pair(tmp_path)
    env = dict(ENV, XLA_FLAGS="--xla_force_host_platform_device_count=2")
    for mode in ([], ["--separate-outputs", "0"]):
        tag = "m" if mode else "s"
        _run_filter([p1, p2], str(tmp_path / ("mem" + tag)), mode, env=env)
        _run_filter([p1, p2], str(tmp_path / ("st" + tag)), mode +
                    ["--streaming", "--mesh", "2", "--mesh-batch", "64",
                     "--streaming-chunk-mb", "0.004"], env=env)
        names = [""] if mode else ["-MinDepth2-r1.fastq",
                                   "-MinDepth2-r2.fastq"]
        for fn in names:
            a = open(str(tmp_path / ("mem" + tag + fn)), "rb").read()
            b = open(str(tmp_path / ("st" + tag + fn)), "rb").read()
            assert a == b and len(a) > 500, (mode, fn)


def test_paired_twofile_streaming_distributed(tmp_path):
    """The flagship composition over a two-file mate PAIR: 2-process
    --streaming --distributed with record-lockstep paired chunks
    block-partitioned by rank, byte-identical to the single-process
    paired streaming engine in BOTH output modes (merged gathers as
    (part, rank)-ordered file-sequential output)."""
    from test_multihost import _spawn

    p1, p2 = _split_pair(tmp_path)
    env1 = dict(os.environ, PYTHONPATH=REPO)
    env1.pop("JAX_PLATFORMS", None)
    for mode in ([], ["--separate-outputs", "0"]):
        tag = "m" if mode else "s"
        single = str(tmp_path / ("single" + tag))
        subprocess.run(
            [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
             "--jax-platform", "cpu", "--min-read-length", "25",
             "--streaming", "--streaming-chunk-mb", "0.004",
             "--threads", "1"] + mode +
            ["--out", single, "21", p1, p2],
            check=True, env=env1, capture_output=True)

        out = str(tmp_path / ("dist" + tag))

        def argv(pid, port, mode=mode, out=out):
            return [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
                    "--jax-platform", "cpu", "--streaming",
                    "--streaming-chunk-mb", "0.004",
                    "--distributed", "127.0.0.1:%d" % port,
                    "--nprocs", "2", "--procid", str(pid),
                    "--mesh-batch", "64", "--min-read-length", "25"] + \
                   mode + ["--out", out, "21", p1, p2]

        _spawn(2, argv)
        names = [""] if mode else ["-MinDepth2-r1.fastq",
                                   "-MinDepth2-r2.fastq"]
        for fn in names:
            a = open(single + fn, "rb").read()
            b = open(out + fn, "rb").read()
            assert a == b and len(a) > 500, (mode, fn)
