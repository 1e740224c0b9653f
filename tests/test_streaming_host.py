"""Memory-bounded host FilterReads (--streaming, spill-counted) and the
out-of-core SpillCounter: exact counts, golden-identical output, bounded
peak memory structure (VERDICT missing-#5 / weak-#1)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")


def test_spill_counter_exact():
    """SpillCounter over chunked reads == one-shot host spectrum (keys,
    counts, weights)."""
    from kmernator_tpu.io.reads import load_reads
    from kmernator_tpu.io.chunked import stream_readsets
    from kmernator_tpu.apps.filter_reads import (build_spectrum,
                                                 _chunk_observations)
    from kmernator_tpu.parallel.spill import SpillCounter

    rs = load_reads([REF + "/1000.fastq"], 33, 64, True)
    hsp = build_spectrum(rs, 31, 3, 64, 0.10)
    sc = SpillCounter(31, 4)
    for ch in stream_readsets([REF + "/1000.fastq"], 20 * 1024, 64):
        keys, good, w = _chunk_observations(ch, 31, 3, 64, 0.10)
        sc.add(keys, good, w)
    ssp = sc.finalize(1)
    assert np.array_equal(hsp.keys, ssp.keys)
    assert np.array_equal(hsp.counts, ssp.counts)
    assert np.allclose(hsp.weighted, ssp.weighted, rtol=1e-5)
    assert ssp.raw_kmers == hsp.raw_kmers
    assert ssp.raw_good_kmers == hsp.raw_good_kmers


def test_build_spectrum_in_parts_out_of_core():
    """The --build-partitions path (now spill-backed) == one-shot build."""
    from kmernator_tpu.io.reads import load_reads
    from kmernator_tpu.apps.filter_reads import (build_spectrum,
                                                 build_spectrum_in_parts)
    rs = load_reads([REF + "/1000.fastq"], 33, 64, True)
    a = build_spectrum(rs, 31, 3, 64, 0.10)
    b = build_spectrum_in_parts(rs, 31, 3, 64, 0.10, num_parts=5,
                                reads_per_slice=123)
    assert np.array_equal(a.keys, b.keys)
    assert np.array_equal(a.counts, b.counts)


@pytest.mark.parametrize("chunk_mb,threads", [(0.02, 1), (0.02, 3), (8, 1)])
def test_streaming_cli_golden(tmp_path, chunk_mb, threads):
    """--streaming multi-chunk output is byte-identical to the golden with
    both the sequential engine and the fork worker pool (--threads)."""
    out = str(tmp_path / "out")
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--jax-platform", "cpu", "--streaming", "--threads", str(threads),
           "--streaming-chunk-mb", str(chunk_mb), "--streaming-parts", "4",
           "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
           "--artifact-edit-distance", "1",
           "--fastq-output-base-quality", "64", "--min-read-length", "25",
           "--out", out, "31", REF + "/1000.fastq"]
    subprocess.run(cmd, check=True, env=ENV, capture_output=True)
    mine = open(out + "-MinDepth2-1000.fastq", "rb").read()
    want = open(REF + "/1000-Filtered.fastq", "rb").read()
    assert mine == want


def test_streaming_parallel_equals_sequential_paired(tmp_path):
    """Worker-pool streaming == sequential streaming, byte for byte, on a
    paired input at the same chunk size (pair logic runs per chunk)."""
    outs = []
    for threads in (1, 4):
        out = str(tmp_path / ("o%d" % threads))
        cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
               "--jax-platform", "cpu", "--streaming",
               "--threads", str(threads),
               "--streaming-chunk-mb", "0.01", "--streaming-parts", "3",
               "--min-read-length", "25",
               "--out", out, "21", REF + "/10-cs18.std.fastq"]
        subprocess.run(cmd, check=True, env=ENV, capture_output=True)
        outs.append(open(out + "-MinDepth2-10-cs18.std.fastq", "rb").read())
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_streaming_rejects_normalization(tmp_path):
    out = str(tmp_path / "out")
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--jax-platform", "cpu", "--streaming",
           "--max-kmer-output-depth", "50",
           "--out", out, "31", REF + "/1000.fastq"]
    r = subprocess.run(cmd, env=ENV, capture_output=True)
    assert r.returncode == 1
    assert b"does not support" in r.stderr


def test_streaming_mesh_spectrum_exact():
    """Chunked --streaming --mesh counting == one-shot host spectrum."""
    from kmernator_tpu.io.reads import load_reads
    from kmernator_tpu.io.chunked import stream_readsets
    from kmernator_tpu.apps.filter_reads import (build_spectrum,
                                                 _streaming_mesh_count)

    rs = load_reads([REF + "/1000.fastq"], 33, 64, True)
    hsp = build_spectrum(rs, 31, 3, 64, 0.10)
    chunks = stream_readsets([REF + "/1000.fastq"], 20 * 1024, 64)
    msp = _streaming_mesh_count(chunks, [REF + "/1000.fastq"], 31, 3, 64,
                                0.10, mesh_devices=3, batch_reads=64,
                                capacity=0, subtract_keys=None, track_w=True)
    assert np.array_equal(hsp.keys, msp.keys)
    assert np.array_equal(hsp.counts, msp.counts)
    # device weight accumulation is f32 (vs f64 on host): ~1e-4 relative
    assert np.allclose(hsp.weighted, msp.weighted, rtol=2e-3)
    assert msp.raw_kmers == hsp.raw_kmers
    assert msp.raw_good_kmers == hsp.raw_good_kmers


@pytest.mark.parametrize("mesh_n", [1, 4])
def test_streaming_mesh_cli_golden(tmp_path, mesh_n):
    """--streaming --mesh N multi-chunk output is byte-identical to the
    golden at any device count (decomposition invariance)."""
    out = str(tmp_path / "out")
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--jax-platform", "cpu", "--streaming",
           "--mesh", str(mesh_n), "--mesh-batch", "96",
           "--streaming-chunk-mb", "0.02",
           "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
           "--artifact-edit-distance", "1",
           "--fastq-output-base-quality", "64", "--min-read-length", "25",
           "--out", out, "31", REF + "/1000.fastq"]
    subprocess.run(cmd, check=True, env=ENV, capture_output=True)
    mine = open(out + "-MinDepth2-1000.fastq", "rb").read()
    want = open(REF + "/1000-Filtered.fastq", "rb").read()
    assert mine == want


def test_streaming_gz_bounded_chunks(tmp_path):
    """gz inputs stream through bounded decompressed chunks and produce
    output byte-identical to the plain-FASTQ streaming run."""
    import gzip
    import shutil
    gz = str(tmp_path / "in.fastq.gz")
    with open(REF + "/1000.fastq", "rb") as f, gzip.open(gz, "wb") as g:
        shutil.copyfileobj(f, g)
    outs = []
    for inp in (gz, REF + "/1000.fastq"):
        out = str(tmp_path / ("o-" + os.path.basename(inp)))
        cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
               "--jax-platform", "cpu", "--streaming", "--threads", "1",
               "--streaming-chunk-mb", "0.05", "--streaming-parts", "3",
               "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
               "--artifact-edit-distance", "1",
               "--fastq-output-base-quality", "64", "--min-read-length", "25",
               "--out", out, "31", inp]
        subprocess.run(cmd, check=True, env=ENV, capture_output=True)
        pref = os.path.basename(inp).split(".")[0]
        name = [f for f in os.listdir(tmp_path)
                if f.startswith(os.path.basename(out) + "-MinDepth2")][0]
        outs.append(open(str(tmp_path / name), "rb").read())
    # same record set (chunk boundaries differ between gz and mmap cuts,
    # which only permutes per-chunk remnant placement)
    def recs(b):
        lines = b.split(b"\n")
        return sorted(b"\n".join(lines[i:i + 4])
                      for i in range(0, len(lines) - 1, 4))
    assert recs(outs[0]) == recs(outs[1]) and len(outs[0]) > 0


def test_auto_stream_default_threshold(tmp_path):
    """The default auto-stream gate: a FASTQ just over the ~2 MB engine
    crossover engages streaming with no flags (the in-memory engine
    measured 130 s vs streaming's 5 s at 256 MB — users should get the
    fast engine without asking), while a FASTA of the same size stays on
    the in-memory loader (streaming is FASTQ-only)."""
    lines = open(REF + "/1000.fastq", "rb").read().decode().splitlines()
    recs = ["\n".join(lines[i:i + 4]) for i in range(0, len(lines), 4)]
    fq = str(tmp_path / "big.fastq")
    with open(fq, "w") as f:
        c = 0
        size = 0
        while size < (3 << 20):
            for rec in recs:
                parts = rec.split("\n")
                parts[0] = "@t%05d_%s" % (c, parts[0][1:])
                blk = "\n".join(parts) + "\n"
                f.write(blk)
                size += len(blk)
            c += 1
    fa = str(tmp_path / "big.fasta")
    with open(fq) as src, open(fa, "w") as dst:
        while True:
            h = src.readline()
            if not h:
                break
            s = src.readline()
            src.readline()
            src.readline()
            dst.write(">" + h[1:] + s)

    base = ["--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
            "--artifact-edit-distance", "1",
            "--fastq-output-base-quality", "64", "--min-read-length", "25",
            "--verbose", "1"]
    r = subprocess.run(
        [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
         "--jax-platform", "cpu", "--out", str(tmp_path / "ofq")]
        + base + ["31", fq], check=True, env=ENV, capture_output=True)
    assert b"using the streaming engine" in r.stderr
    assert os.path.getsize(str(tmp_path / "ofq-MinDepth2-big.fastq")) > 1000

    r = subprocess.run(
        [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
         "--jax-platform", "cpu", "--out", str(tmp_path / "ofa")]
        + base + ["31", fa], check=True, env=ENV, capture_output=True)
    assert b"using the streaming engine" not in r.stderr
    outs = [f for f in os.listdir(str(tmp_path)) if f.startswith("ofa-")]
    assert outs, "FASTA input must still produce output via the in-memory path"
