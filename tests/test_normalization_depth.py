"""Coverage normalization must actually normalize: post-normalization
per-kmer depth is capped near --max-kmer-output-depth (VERDICT weak-#8 —
the old test only checked pair symmetry).  Covers both RANDOM
(ref: pickCoverageNormalizedSubset, src/ReadSelector.h:661-749) and
OPTIMAL (ref: pickBestCoveringSubsetReads, src/ReadSelector.h:751-922),
and guards the vectorized OPTIMAL rescore path's runtime."""
import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = 21


@pytest.fixture(scope="module")
def deep_fastq(tmp_path_factory):
    """~150x coverage of a 4kb genome, error-free phred-40 reads."""
    rng = np.random.default_rng(21)
    genome = rng.integers(0, 4, 4000, dtype=np.uint8)
    L, n = 100, 6000
    path = tmp_path_factory.mktemp("norm") / "norm.fastq"
    bases = np.frombuffer(b"ACGT", np.uint8)
    with open(path, "wb") as f:
        for i in range(n):
            s = int(rng.integers(0, 4000 - L))
            read = genome[s:s + L]
            f.write(b"@r%d\n" % i)
            f.write(bases[read].tobytes() + b"\n+\n")
            f.write(b"I" * L + b"\n")
    return str(path)


def _kmer_depths(path):
    from kmernator_tpu.io.reads import load_reads, BASE_CODE
    from kmernator_tpu.ops.kmer import extract_kmers_flat
    from kmernator_tpu.parallel.spectrum import pack_keys
    rs = load_reads([path])
    codes = np.where(BASE_CODE[rs.seq] == 4, 0, BASE_CODE[rs.seq]).astype(np.uint8)
    canon, _, _, _ = extract_kmers_flat(codes, rs.offsets, K)
    keys, counts = np.unique(pack_keys(canon), return_counts=True)
    return rs.n, dict(zip(keys.tolist(), counts.tolist()))


def _run(method, deep_fastq, out):
    env = dict(os.environ, PYTHONPATH=REPO)
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
           "--min-read-length", "25", "--normalization-method", method,
           "--max-kmer-output-depth", "20",
           "--out", out, str(K), deep_fastq]
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    return time.time() - t0


def test_optimal_normalization_caps_depth(deep_fastq, tmp_path):
    out = str(tmp_path / "opt")
    dt = _run("OPTIMAL", deep_fastq, out)
    n_in, depth_in = _kmer_depths(deep_fastq)
    n_out, depth_out = _kmer_depths(out + "-MinDepth2-MaxDepth20-norm.fastq")
    assert 0 < n_out < n_in / 3           # strong thinning at 150x -> 20x
    deep_in = [kk for kk, c in depth_in.items() if c >= 100]
    assert len(deep_in) > 1000
    # the covering-subset invariant: no picked read contained a kmer already
    # at max depth, so per-kmer depth stays at/below the cap (+tiny slack
    # for within-read duplicate kmers)
    d = np.array([depth_out.get(kk, 0) for kk in deep_in])
    assert d.max() <= 22
    # and coverage is preserved: deep kmers don't vanish
    assert (d >= 1).mean() > 0.99
    assert dt < 120.0                     # vectorized rescore, not per-kmer


def test_random_normalization_thins_depth(deep_fastq, tmp_path):
    out = str(tmp_path / "rnd")
    _run("RANDOM", deep_fastq, out)
    n_in, depth_in = _kmer_depths(deep_fastq)
    n_out, depth_out = _kmer_depths(out + "-MinDepth2-MaxDepth20-norm.fastq")
    assert 0 < n_out < n_in
    deep_in = [kk for kk, c in depth_in.items() if c >= 100]
    d_in = np.array([depth_in[kk] for kk in deep_in])
    d_out = np.array([depth_out.get(kk, 0) for kk in deep_in])
    # stochastic cap: mean depth of deep kmers drops by >2x toward target
    assert d_out.mean() < d_in.mean() / 2
    assert (d_out >= 1).mean() > 0.95
