"""Vectorized artifact scan must agree with the scalar reference
transcription on randomized reads."""
import numpy as np

from kmernator_tpu.io.reads import ReadSet
from kmernator_tpu.ops.artifact import ArtifactFilter


def test_scan_all_matches_scalar():
    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", np.uint8)
    filt = ArtifactFilter(edit_distance=1, min_quality=3, min_read_length=0.5)
    # sample some artifact sequences to implant
    from kmernator_tpu.io.reads import parse_fasta_bytes
    import os
    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "kmernator_tpu", "data")
    names, comments, seq, qual, offsets, hq = parse_fasta_bytes(
        open(os.path.join(data_dir, "artifacts.fasta"), "rb").read())
    artifacts = [seq[offsets[i]:offsets[i + 1]].tobytes() for i in range(len(names))]

    rs = ReadSet()
    n = 300
    for i in range(n):
        L = int(rng.integers(20, 140))
        read = bytearray(bases[rng.integers(0, 4, L)].tobytes())
        r = rng.random()
        if r < 0.3 and L >= 40:
            # implant an artifact fragment at a random (possibly unaligned) pos
            art = artifacts[int(rng.integers(0, len(artifacts)))]
            frag = art[:min(len(art), 30)]
            p = int(rng.integers(0, L - len(frag) + 1))
            read[p:p + len(frag)] = frag
        ph = rng.integers(0, 41, L)
        if r > 0.8:
            # low-quality stretch
            a = int(rng.integers(0, L))
            b = min(L, a + int(rng.integers(1, 20)))
            ph[a:b] = rng.integers(0, 3, b - a)
        rs.append_read(b"r%d" % i, b"", bytes(read), ph)

    v, mn, mx, so, sl, wp = filt.scan_all(rs)
    for i in range(n):
        ev, emn, emx, esec, ephix = filt._scan_read(rs, i)
        assert (v[i] > 0) == (ev > 0), (i, v[i], ev)
        assert mn[i] == emn and mx[i] == emx, (i, mn[i], mx[i], emn, emx)
        assert (so[i], so[i] + sl[i]) == esec or sl[i] == esec[1] - esec[0], i
        assert wp[i] == ephix
