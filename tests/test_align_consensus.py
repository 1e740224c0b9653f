"""KmerAligner, centroid, GC heat map, consensus fixtures."""
import numpy as np

from kmernator_tpu.io.reads import load_reads
from kmernator_tpu.ops.align import KmerAligner, revcomp
from kmernator_tpu.ops.consensus import consensus_read, get_centroid

REF = "/root/reference/test"


def test_consensus_fixtures():
    """ref: test/ReadSetTest.cpp testConsensus — consensus of the evens/odds
    equals the first read of each; centroid is read 0."""
    for f in ["consensus1", "consensus2", "consensus3", "consensus2-diff"]:
        rs = load_reads([REF + "/%s.fastq" % f])
        ev = list(range(0, rs.n, 2))
        od = list(range(1, rs.n, 2))
        _, f1, _ = consensus_read(rs, ev, 0, 33)
        _, f2, _ = consensus_read(rs, od, 0, 33)
        assert f1 == rs.get_seq(0)
        assert f2 == rs.get_seq(1)
        assert get_centroid(rs, ev, 3, 33) == 0
        assert get_centroid(rs, od, 3, 33) == 0


def test_kmer_aligner():
    rng = np.random.default_rng(1)
    g = "".join(rng.choice(list("ACGT"), 500))
    target = g[:300].encode()
    a = KmerAligner(target, 21)
    aln = a.align(g[250:400].encode())
    assert aln.overlap == 50 and aln.mismatches == 0 and aln.identity == 1.0
    aln2 = a.align(revcomp(g[250:400].encode()))
    assert aln2.overlap == 50 and aln2.query.reversed
    q3 = bytearray(g[240:320].encode())
    q3[40] ^= 6  # flip to a different base
    aln3 = a.align(bytes(q3))
    assert aln3.overlap == 60 and aln3.mismatches == 1


def test_gc_heat_map():
    from kmernator_tpu.parallel.spectrum import KmerSpectrum
    from kmernator_tpu.apps.filter_reads import build_spectrum
    rs = load_reads([REF + "/1000.fastq"])
    sp = build_spectrum(rs, 21, 3, 33, 0.10)
    hm = sp.gc_heat_map()
    lines = hm.strip().splitlines()
    assert lines[0].startswith("depth\t0")
    assert len(lines) == int(sp.counts.max()) + 2
