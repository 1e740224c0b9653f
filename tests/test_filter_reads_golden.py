"""Golden-file integration tests for FilterReads: byte-identical output vs
the reference's committed goldens (ref: test/runFilterTests.sh:24-76)."""
import os
import subprocess
import sys

import pytest

REF = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    # (input, extra args, golden)
    ("1000.fastq", ["--fastq-output-base-quality", "33", "--min-read-length", "0.85"],
     "1000-Filtered-0.85.std.fastq"),
    ("1000.fastq", ["--fastq-output-base-quality", "64", "--min-read-length", "0.85"],
     "1000-Filtered-0.85.fastq"),
    ("1000.std.fastq", ["--fastq-output-base-quality", "33", "--min-read-length", "0.85"],
     "1000-Filtered-0.85.std.fastq"),
    ("1000.std.fastq", ["--fastq-output-base-quality", "64", "--min-read-length", "0.85"],
     "1000-Filtered-0.85.fastq"),
    ("1000.fastq", ["--fastq-output-base-quality", "64", "--min-read-length", "1"],
     "1000-Filtered-readlength.fastq"),
    ("1000.fastq", ["--fastq-output-base-quality", "64", "--min-read-length", "1",
                    "--min-passing-in-pair", "2"],
     "1000-Filtered-readlength-both.fastq"),
    ("1000.fastq", ["--fastq-output-base-quality", "64", "--min-read-length", "25"],
     "1000-Filtered.fastq"),
]


def run_filter_reads(tmp_path, inp, args):
    out = str(tmp_path / "out")
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
           "--artifact-edit-distance", "1"] + args + \
          ["--out", out, "31", os.path.join(REF, inp)]
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    subprocess.run(cmd, check=True, env=env, capture_output=True)
    prefix = os.path.basename(inp).rsplit(".", 1)[0]
    return out + "-MinDepth2-" + prefix + ".fastq"


@pytest.mark.parametrize("inp,args,golden", CASES,
                         ids=[c[2] + ":" + c[0] for c in CASES])
def test_golden(tmp_path, inp, args, golden):
    got = run_filter_reads(tmp_path, inp, args)
    with open(got, "rb") as f:
        mine = f.read()
    with open(os.path.join(REF, golden), "rb") as f:
        want = f.read()
    assert mine == want, "output differs from golden %s" % golden


def test_save_load_spectrum(tmp_path):
    """--save-kmer-mmap / --load-kmer-mmap round trip
    (ref: test/runFilterTests.sh:72-75)."""
    out1 = str(tmp_path / "a")
    out2 = str(tmp_path / "b")
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    base = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
            "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
            "--artifact-edit-distance", "1", "--fastq-output-base-quality", "64",
            "--min-read-length", "25"]
    subprocess.run(base + ["--save-kmer-mmap", "1", "--out", out1, "31",
                           os.path.join(REF, "1000.fastq")],
                   check=True, env=env, capture_output=True)
    subprocess.run(base + ["--load-kmer-mmap", out1 + "-mmap", "--out", out2, "31",
                           os.path.join(REF, "1000.fastq")],
                   check=True, env=env, capture_output=True)
    a = open(out1 + "-MinDepth2-1000.fastq", "rb").read()
    b = open(out2 + "-MinDepth2-1000.fastq", "rb").read()
    golden = open(os.path.join(REF, "1000-Filtered.fastq"), "rb").read()
    assert a == b == golden


def test_subtract_file_removes_reference_kmers(tmp_path):
    """--subtract-file: kmers abundant in the subtract set contribute no
    counts, so reads made of them fail min-depth and are discarded
    (ref: FilterReads-P.cpp subtract spectra)."""
    out_plain = str(tmp_path / "plain")
    out_sub = str(tmp_path / "sub")
    base = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
            "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
            "--artifact-edit-distance", "1",
            "--fastq-output-base-quality", "64", "--min-read-length", "25",
            "31", os.path.join(REF, "1000.fastq")]
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    subprocess.run(base[:3] + ["--out", out_plain] + base[3:], check=True,
                   env=env, capture_output=True)
    # subtract the phiX genome itself: nearly every read is phiX-derived
    phix = os.path.join(REPO, "kmernator_tpu/data/phix174.fasta")
    subprocess.run(base[:3] + ["--out", out_sub, "--subtract-file", phix,
                               "--min-depth", "1"] + base[3:],
                   check=True, env=env, capture_output=True)
    plain = open(out_plain + "-MinDepth2-1000.fastq", "rb").read()
    sub = open(out_sub + "-MinDepth1-1000.fastq", "rb").read()
    assert len(plain) > 100000
    # with phiX subtracted, almost nothing passes
    assert sub.count(b"\n") < plain.count(b"\n") // 4
