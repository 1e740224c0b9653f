"""BAM/BGZF stack vs the reference 10k.bam fixtures
(ref: test/SamUtilsTest.sh contracts)."""
import gzip
import os
import subprocess
import sys

import numpy as np

from kmernator_tpu.io.bam import (load_alignments, parse_bam, write_bam,
                                  coordinate_sort_order)

REF = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")


def test_parse_10k():
    bd = load_alignments(REF + "/10k.bam")
    assert bd.n == 20000
    assert bd.ref_names == [b"gi|9626372|ref|NC_001422.1|"]


def test_unmapped_sets_match_goldens():
    bd = load_alignments(REF + "/10k.bam")
    unm = (bd.flag & 4) != 0
    placed = bd.ref_id >= 0

    gu = gzip.open(REF + "/10k.bam-test.bam-sort.bam-unmapped.fastq.gz").read().split(b"\n")
    golden_unmapped = set(l[1:].split(b"/")[0] for l in gu[0::4] if l)
    mine = set(bd.name(int(i)) for i in np.flatnonzero(unm))
    assert mine == golden_unmapped

    from kmernator_tpu.apps.bam_sort import to_fastq
    gp = gzip.open(REF + "/10k.bam-test.bam-sort.bam-pairs.fastq.gz").read()
    mine_fq = b"".join(to_fastq(bd, int(i)) for i in np.flatnonzero(unm & ~placed))
    assert sorted(mine_fq.split(b"\n")) == sorted(gp.split(b"\n"))


def test_write_roundtrip(tmp_path):
    bd = load_alignments(REF + "/10k.bam")
    data = write_bam(bd)
    bd2 = parse_bam(data)
    assert bd2.n == bd.n
    assert bd2.records == bd.records
    assert bd2.header_text.rstrip(b"\n") == bd.header_text.rstrip(b"\n")


def test_sort_app(tmp_path):
    out = str(tmp_path / "sorted.bam")
    un = str(tmp_path / "un.fastq.gz")
    pr = str(tmp_path / "pr.fastq.gz")
    subprocess.run([sys.executable, "-m", "kmernator_tpu.apps.bam_sort",
                    "--unmapped-reads", un, "--unmapped-read-pairs", pr,
                    out, REF + "/10k.bam"], check=True, env=ENV,
                   capture_output=True)
    bd = load_alignments(out)
    # sorted by coordinate, unmapped-placed retained, unplaced dropped
    ref = np.where(bd.ref_id < 0, 1 << 30, bd.ref_id)
    key = ref.astype(np.int64) * (1 << 34) + bd.pos
    assert (np.diff(key) >= 0).all()
    assert (bd.ref_id >= 0).all()
    orig = load_alignments(REF + "/10k.bam")
    n_unplaced = int((orig.ref_id < 0).sum())
    assert bd.n == orig.n - n_unplaced
    # fastq.gz round trip readable
    gz = gzip.open(un).read().split(b"\n")
    assert len([l for l in gz[0::4] if l]) == int(((orig.flag & 4) != 0).sum()) - n_unplaced
