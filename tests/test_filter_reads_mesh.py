"""FilterReads --mesh N: the FilterReads-P analogue must produce
byte-identical output to the golden at every device count (the reference's
MPI rank-sweep invariant, ref: test/runFilterTests.sh:93-128)."""
import os
import subprocess
import sys

import pytest

REF = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("ndev", [1, 2, 3, 8])
def test_mesh_golden_invariance(tmp_path, ndev):
    out = str(tmp_path / "out")
    env = dict(os.environ, PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--jax-platform", "cpu", "--mesh", str(ndev),
           "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
           "--artifact-edit-distance", "1",
           "--fastq-output-base-quality", "64", "--min-read-length", "25",
           "--out", out, "31", os.path.join(REF, "1000.fastq")]
    subprocess.run(cmd, check=True, env=env, capture_output=True)
    mine = open(out + "-MinDepth2-1000.fastq", "rb").read()
    want = open(os.path.join(REF, "1000-Filtered.fastq"), "rb").read()
    assert mine == want


def test_mesh_golden_085(tmp_path):
    """Second config through the mesh path (base-33 output, fractional
    min-read-length)."""
    out = str(tmp_path / "out")
    env = dict(os.environ, PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--jax-platform", "cpu", "--mesh", "4",
           "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
           "--artifact-edit-distance", "1",
           "--fastq-output-base-quality", "33", "--min-read-length", "0.85",
           "--out", out, "31", os.path.join(REF, "1000.fastq")]
    subprocess.run(cmd, check=True, env=env, capture_output=True)
    mine = open(out + "-MinDepth2-1000.fastq", "rb").read()
    want = open(os.path.join(REF, "1000-Filtered-0.85.std.fastq"), "rb").read()
    assert mine == want


def test_mesh_golden_pair_policy(tmp_path):
    """Third config through the mesh path: min-read-length 1 +
    min-passing-in-pair 2 (the pair-coupled selection policy)."""
    out = str(tmp_path / "out")
    env = dict(os.environ, PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--jax-platform", "cpu", "--mesh", "4",
           "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
           "--artifact-edit-distance", "1",
           "--fastq-output-base-quality", "64", "--min-read-length", "1",
           "--min-passing-in-pair", "2",
           "--out", out, "31", os.path.join(REF, "1000.fastq")]
    subprocess.run(cmd, check=True, env=env, capture_output=True)
    mine = open(out + "-MinDepth2-1000.fastq", "rb").read()
    want = open(os.path.join(REF, "1000-Filtered-readlength-both.fastq"),
                "rb").read()
    assert mine == want


def test_mesh_golden_all_seven_configs(tmp_path):
    """Every runFilterTests.sh golden config through the mesh path at N=3
    (the full single-process sweep already runs in
    test_filter_reads_golden; this pins the mesh engine to the same 7,
    ref: test/runFilterTests.sh:24-76 x :93-128)."""
    from tests.test_filter_reads_golden import CASES
    env = dict(os.environ, PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    for i, (inp, args, golden) in enumerate(CASES):
        out = str(tmp_path / ("out%d" % i))
        cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
               "--jax-platform", "cpu", "--mesh", "3",
               "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
               "--artifact-edit-distance", "1"] + args + \
              ["--out", out, "31", os.path.join(REF, inp)]
        subprocess.run(cmd, check=True, env=env, capture_output=True)
        prefix = os.path.basename(inp).rsplit(".", 1)[0]
        mine = open(out + "-MinDepth2-" + prefix + ".fastq", "rb").read()
        want = open(os.path.join(REF, golden), "rb").read()
        assert mine == want, "mesh output differs from %s" % golden
