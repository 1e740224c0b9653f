"""MeraculousCounter golden tests: sorted-identical mercount/mergraph
(ref: test/runMeraculousTests.sh:40-74)."""
import os
import subprocess
import sys

REF = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_mercount_mergraph_golden(tmp_path):
    out = str(tmp_path / "mc")
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.meraculous_counter",
           "--min-kmer-quality", "0", "--min-quality-score", "2",
           "--kmer-size", "21", "--fastq-base-quality", "64",
           "--out", out, os.path.join(REF, "1000.fastq")]
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    subprocess.run(cmd, check=True, env=env, capture_output=True)

    for mine_name, golden_name in [
            ("mc.mercount.m21", "phix.mercount.m21"),
            ("mc.mergraph.m21.D2", "phix.mergraph.m21.D2")]:
        mine = sorted(open(str(tmp_path / mine_name), "rb").read().splitlines())
        want = sorted(open(os.path.join(REF, golden_name), "rb").read().splitlines())
        assert mine == want, "%s differs" % golden_name


def test_mesh_decomposition_invariance(tmp_path):
    """Distributed extension-tracking spectrum (--mesh N) must reproduce the
    goldens at several device counts (the reference's rank-sweep,
    ref: test/runMeraculousTests.sh:85-127)."""
    import pytest
    for ndev in (2, 8):
        out = str(tmp_path / ("mc%d" % ndev))
        cmd = [sys.executable, "-m", "kmernator_tpu.apps.meraculous_counter",
               "--jax-platform", "cpu", "--mesh", str(ndev),
               "--min-kmer-quality", "0", "--min-quality-score", "2",
               "--kmer-size", "21", "--fastq-base-quality", "64",
               "--out", out, os.path.join(REF, "1000.fastq")]
        env = dict(os.environ, PYTHONPATH=REPO,
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        subprocess.run(cmd, check=True, env=env, capture_output=True)
        for mine_name, golden_name in [
                ("mercount.m21", "phix.mercount.m21"),
                ("mergraph.m21.D2", "phix.mergraph.m21.D2")]:
            mine = sorted(open(out + "." + mine_name, "rb").read().splitlines())
            want = sorted(open(os.path.join(REF, golden_name), "rb").read().splitlines())
            assert mine == want, "%s differs at mesh=%d" % (golden_name, ndev)


def test_dump_speed_1m():
    """Vectorized/native dumps: 10^6-kmer mercount+mergraph in seconds,
    not hours (the reference-scale dump path, VERDICT weak-#6)."""
    import time
    import numpy as np
    import tempfile
    from kmernator_tpu.parallel.spectrum import KmerSpectrum
    from kmernator_tpu.apps.meraculous_counter import dump_counts, dump_graphs
    rng = np.random.default_rng(0)
    M = 1_000_000
    sp = KmerSpectrum(k=21)
    sp.keys = np.sort(rng.integers(0, 1 << 42, M, dtype=np.uint64))
    sp.counts = rng.integers(1, 1000, M).astype(np.int64)
    sp.extensions = rng.integers(0, 50, (M, 12)).astype(np.int64)
    d = tempfile.mkdtemp()
    t0 = time.time()
    dump_counts(sp, d + "/c", 1)
    dump_graphs(sp, d + "/g", 1)
    assert time.time() - t0 < 30.0


def test_streaming_builder_matches_inmemory_and_golden(tmp_path):
    """--streaming (bounded-memory spill-part build, the reference's
    streaming MPI MeraculousCounter analogue): byte-identical mercount and
    mergraph vs the in-memory builder, and sorted-identical vs the
    reference goldens.  Tiny chunks and a forced part count exercise
    multi-chunk routing and multi-part finalize."""
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    base = [sys.executable, "-m", "kmernator_tpu.apps.meraculous_counter",
            "--min-kmer-quality", "0", "--min-quality-score", "2",
            "--kmer-size", "21", "--fastq-base-quality", "64"]
    inp = os.path.join(REF, "1000.fastq")
    mem = str(tmp_path / "mem")
    subprocess.run(base + ["--out", mem, inp], check=True, env=env,
                   capture_output=True)
    stre = str(tmp_path / "str")
    subprocess.run(base + ["--streaming", "--streaming-chunk-mb", "0.05",
                           "--streaming-parts", "5", "--out", stre, inp],
                   check=True, env=env, capture_output=True)
    for suffix, golden_name in [(".mercount.m21", "phix.mercount.m21"),
                                (".mergraph.m21.D2", "phix.mergraph.m21.D2")]:
        a = open(mem + suffix, "rb").read()
        b = open(stre + suffix, "rb").read()
        assert a == b, "streaming %s differs from in-memory" % suffix
        want = sorted(open(os.path.join(REF, golden_name),
                           "rb").read().splitlines())
        assert sorted(b.splitlines()) == want, "%s vs golden" % suffix
