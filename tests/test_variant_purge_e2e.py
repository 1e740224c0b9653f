"""End-to-end --variant-sigmas through the FilterReads CLI: host and mesh
paths must purge the SAME variants and emit identical output, on data deep
enough for the reference's threshold quirk (thr/20 at distance 1) to
actually purge (coverage >> 60x)."""
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def deep_fastq(tmp_path_factory):
    """200x coverage of a 3kb genome with 1% errors: error kmers sit at
    counts 1-10 while true kmers are ~200 -> purgeable."""
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, 3000, dtype=np.uint8)
    L, n = 100, 6000
    path = tmp_path_factory.mktemp("deep") / "deep.fastq"
    bases = np.frombuffer(b"ACGT", np.uint8)
    with open(path, "wb") as f:
        for i in range(n):
            s = int(rng.integers(0, 3000 - L))
            read = genome[s:s + L].copy()
            nerr = rng.poisson(1.0)
            for _ in range(nerr):
                read[int(rng.integers(0, L))] = rng.integers(0, 4)
            f.write(b"@r%d\n" % i)
            f.write(bases[read].tobytes() + b"\n+\n")
            f.write(b"I" * L + b"\n")
    return str(path)


def _run(args, out):
    env = dict(os.environ, PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--jax-platform", "cpu", "--verbose", "1",
           "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
           "--min-read-length", "25",
           "--variant-sigmas", "2.0", "--min-variant-kmer-depth", "20",
           "--out", out] + args
    r = subprocess.run(cmd, env=env, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    m = re.search(rb"Removed (\d+) kmer-variants", r.stderr)
    assert m, r.stderr.decode()[-2000:]
    return int(m.group(1))


def test_variant_purge_host_vs_mesh_e2e(deep_fastq, tmp_path):
    host_out = str(tmp_path / "host")
    mesh_out = str(tmp_path / "mesh")
    n_host = _run(["31", deep_fastq], host_out)
    n_mesh = _run(["--mesh", "8", "--mesh-batch", "1024", "31", deep_fastq],
                  mesh_out)
    assert n_host > 0          # the purge actually fired
    assert n_mesh == n_host    # same variants purged on the mesh path
    a = open(host_out + "-MinDepth2-deep.fastq", "rb").read()
    b = open(mesh_out + "-MinDepth2-deep.fastq", "rb").read()
    assert a == b

    # and purging changed the result vs no-purge (non-vacuous)
    plain_out = str(tmp_path / "plain")
    env = dict(os.environ, PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--jax-platform", "cpu",
           "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
           "--min-read-length", "25", "--out", plain_out, "31", deep_fastq]
    r = subprocess.run(cmd, env=env, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    c = open(plain_out + "-MinDepth2-deep.fastq", "rb").read()
    assert a != c
