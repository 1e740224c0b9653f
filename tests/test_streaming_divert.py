"""The streaming engines emit the same --phix-output / --filter-output
diverted files as the in-memory path (ref: FilterKnownOddities::
recordAffectedRead -> omPhiX/omArtifact, src/FilterKnownOddities.h:551-661;
the streaming engines append per chunk)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "kmernator_tpu", "data")


def _read_fasta_seq(path: str) -> bytes:
    seq = []
    with open(path, "rb") as f:
        for line in f:
            if not line.startswith(b">"):
                seq.append(line.strip())
            elif seq:
                break
    return b"".join(seq)


@pytest.fixture(scope="module")
def fastq(tmp_path_factory):
    """Reads engineered to hit every divert bucket: pure phiX 100-mers
    (-> -PhiX.fastq), near-pure adapter reads (-> -Artifact.fastq), and
    plain random reads at ~8x so the spectrum keeps them."""
    rng = np.random.default_rng(3)
    phix = _read_fasta_seq(os.path.join(DATA, "phix174.fasta"))
    adapter = _read_fasta_seq(os.path.join(DATA, "artifacts.fasta"))
    genome = rng.integers(0, 4, 20000, dtype=np.uint8)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    recs = []
    ri = 0

    def emit(seq: bytes):
        nonlocal ri
        recs.append(b"@r%04d\n%s\n+\n%s\n" % (ri, seq, b"I" * len(seq)))
        ri += 1

    for i in range(0, 1600):
        s = int(rng.integers(0, len(genome) - 100))
        emit(acgt[genome[s:s + 100]].tobytes())
        if i % 40 == 0:
            emit(phix[(i * 37) % (len(phix) - 100):][:100])
        if i % 50 == 0:
            emit(adapter[:100] if len(adapter) >= 100 else adapter)
    p = tmp_path_factory.mktemp("divert") / "in.fastq"
    p.write_bytes(b"".join(recs))
    return str(p)


def _run(fastq, out, extra):
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
           "--artifact-edit-distance", "1", "--min-read-length", "25",
           "--phix-output", "1", "--filter-output", "1",
           "--out", out, "31", fastq] + extra
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    subprocess.run(cmd, check=True, env=env, capture_output=True)
    got = {}
    d = os.path.dirname(out)
    for f in sorted(os.listdir(d)):
        fp = os.path.join(d, f)
        with open(fp, "rb") as fh:
            got[f.replace(os.path.basename(out), "OUT")] = fh.read()
        os.unlink(fp)
    return got


@pytest.mark.parametrize("mode", ["seq", "par"])
def test_streaming_diverts_match_inmemory(tmp_path, fastq, mode):
    os.makedirs(tmp_path / "mem")
    os.makedirs(tmp_path / "st")
    want = _run(fastq, str(tmp_path / "mem" / "o"), [])
    extra = ["--streaming", "--streaming-chunk-mb", "0.05"]
    extra += ["--threads", "1"] if mode == "seq" else ["--threads", "4"]
    got = _run(fastq, str(tmp_path / "st" / "o"), extra)
    # the diverted files exist and carry records
    phix = [k for k in want if k.endswith("-PhiX.fastq")]
    art = [k for k in want if k.endswith("-Artifact.fastq")]
    assert phix and want[phix[0]].startswith(b"@")
    assert art and want[art[0]].startswith(b"@")
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == want[k], "streaming %s diverges on %s" % (mode, k)
