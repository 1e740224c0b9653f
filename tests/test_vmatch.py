"""Vmatch-equivalent matcher backend (ops/vmatch.py; ref src/Vmatch.h).

The contract: a read matches a query contig iff it has a local alignment of
length >= -l with <= -e errors on either strand (vmatch "-d -p -l 50 -e 3").
"""
import os
import subprocess
import sys

import numpy as np

from kmernator_tpu.io.reads import ReadSet
from kmernator_tpu.ops.vmatch import (SeedReadIndex, banded_edit_distance,
                                      parse_vmatch_options)

REF = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _rc(s):
    return "".join(COMP[c] for c in reversed(s))


def _phix():
    return "".join(l.strip() for l in
                   open(os.path.join(REPO, "kmernator_tpu/data/phix174.fasta"))
                   if not l.startswith(">"))


def _codes(s):
    from kmernator_tpu.io.reads import BASE_CODE
    return BASE_CODE[np.frombuffer(s.encode(), np.uint8)].astype(np.uint8)


def _mutate(s, positions):
    out = list(s)
    for p in positions:
        out[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[out[p]]
    return "".join(out)


def test_parse_vmatch_options():
    assert parse_vmatch_options("-d -p -seedlength 10 -l 50 -e 3") == (10, 50, 3)
    assert parse_vmatch_options("-seedlength 12 -l 40 -e 1") == (12, 40, 1)


def test_banded_edit_distance():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 4, 60).astype(np.uint8)
    assert banded_edit_distance(a, a, 3) == 0
    b = a.copy()
    b[10] = (b[10] + 1) % 4
    b[40] = (b[40] + 1) % 4
    assert banded_edit_distance(a, b, 3) == 2
    # one deletion
    c = np.delete(a, 25)
    assert banded_edit_distance(a, c, 3) == 1
    # far beyond the band
    d = rng.integers(0, 4, 60).astype(np.uint8)
    assert banded_edit_distance(a, d, 3) == 4


def test_match_contig_strands_and_errors():
    phix = _phix()
    contig = phix[1000:1400]
    rng = np.random.default_rng(3)
    rs = ReadSet()
    # 0: exact forward overlap
    rs.append_read(b"fwd", b"", phix[1050:1126].encode(), None)
    # 1: reverse-complement overlap with 3 substitutions (still a match)
    r = _mutate(phix[1200:1276], [10, 40, 60])
    rs.append_read(b"rc3", b"", _rc(r).encode(), None)
    # 2: too many errors (6 > e=3): must NOT match
    r = _mutate(phix[1100:1176], [5, 17, 29, 41, 53, 65])
    rs.append_read(b"bad", b"", r.encode(), None)
    # 3: unrelated random read: must NOT match
    rs.append_read(b"rand", b"",
                   "".join("ACGT"[i] for i in rng.integers(0, 4, 76)).encode(),
                   None)
    # 4: overlap shorter than l=50: must NOT match
    rs.append_read(b"short", b"",
                   (phix[1360:1400] +
                    "".join("ACGT"[i] for i in rng.integers(0, 4, 36))).encode(),
                   None)

    idx = SeedReadIndex(rs, 10, 50, 3)
    got = idx.match_contig(_codes(contig))
    assert 0 in got and 1 in got
    assert 2 not in got and 3 not in got and 4 not in got


def test_discarded_reads_excluded():
    phix = _phix()
    rs = ReadSet()
    rs.append_read(b"a", b"", phix[100:176].encode(), None)
    rs.append_read(b"b", b"", phix[120:196].encode(), None)
    rs.discarded[1] = True
    idx = SeedReadIndex(rs, 10, 50, 3)
    got = idx.match_contig(_codes(phix[80:300]))
    assert got == {0}


def test_assembler_vmatch_mode(tmp_path):
    """kmer-size 0 selects the Vmatch matcher
    (ref apps/DistributedNucleatingAssembler.cpp:392-397); extension must
    still grow phiX-consistent contigs."""
    out = str(tmp_path / "asm.fa")
    subprocess.run(
        [sys.executable, "-m", "kmernator_tpu.apps.nucleating_assembler",
         "--contig-file", REF + "/5.fa", "--out", out,
         "--max-iterations", "2", "0", REF + "/1000.fastq"],
        check=True, env=ENV, capture_output=True)
    seqs = {}
    name = None
    for line in open(out):
        line = line.strip()
        if line.startswith(">"):
            name = line[1:]
            seqs[name] = ""
        else:
            seqs[name] += line
    assert len(seqs) == 5
    phix = _phix()
    g = phix + phix[:1000]
    grc = _rc(phix) + _rc(phix)[:1000]
    grew = 0
    for name, seq in seqs.items():
        assert seq in g or seq in grc, "contig %s diverged from phiX" % name
        if len(seq) > 76:
            grew += 1
    assert grew >= 3, "expected most seeds to extend in vmatch mode"
