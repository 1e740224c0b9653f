"""Byte-range partitioned BAM input: per-rank partitions reconstruct the
full record stream exactly, each rank reads only ~its share of the
compressed bytes, and the distributed BamSort over the partitioned input
matches the single-process output (ref: SamUtils::readBamFile byte-range
partition + record resync, src/SamUtils.h:509-648)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from kmernator_tpu.io.bam import (load_alignments, load_alignments_partitioned,
                                  next_bgzf_block, _bgzf_block_size)

BAM = "/root/reference/test/10k.bam"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bgzf_block_scan():
    with open(BAM, "rb") as f:
        data = f.read()
    # offset 0 is a block; a mid-file raw offset snaps to a real block
    assert next_bgzf_block(data, 0) == 0
    b = next_bgzf_block(data, len(data) // 2)
    assert len(data) // 2 <= b < len(data)
    assert _bgzf_block_size(data, b) is not None


@pytest.mark.parametrize("size", [2, 3, 5])
def test_partitions_reconstruct_full_stream(size):
    full = load_alignments(BAM)
    got = []
    shares = []
    for rank in range(size):
        st = {}
        bd = load_alignments_partitioned(BAM, rank, size, stats=st)
        assert bd.ref_names == full.ref_names
        got.extend(bd.records)
        shares.append(st["bytes_read"] / st["file_bytes"])
        # every rank parses only its byte range: its compressed reads stay
        # well under the whole file (header + resync windows + its share)
        assert st["bytes_read"] < st["file_bytes"] * (1.0 / size + 0.25)
    assert len(got) == full.n
    assert got == full.records
    # the shares really are split (no rank degenerated to a full read)
    assert max(shares) < 0.9


def test_partition_empty_tail_rank():
    # more ranks than blocks still covers every record exactly once
    full = load_alignments(BAM)
    got = []
    for rank in range(64):
        got.extend(load_alignments_partitioned(BAM, rank, 64).records)
    assert got == full.records


def test_two_process_partitioned_bam_sort(tmp_path):
    """Distributed BamSort over the byte-partitioned input == 1-process
    output (the end-to-end contract of the partitioned read)."""
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    single = str(tmp_path / "single.bam")
    subprocess.run([sys.executable, "-m", "kmernator_tpu.apps.bam_sort",
                    single, BAM], check=True, env=env, capture_output=True)
    out = str(tmp_path / "dist.bam")
    procs = []
    port = 19741
    for r in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "kmernator_tpu.apps.bam_sort",
             "--distributed", "localhost:%d" % port, "--nprocs", "2",
             "--procid", str(r), out, BAM],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
    from kmernator_tpu.io.bam import parse_bam
    a, b = parse_bam(open(single, "rb").read()), \
        parse_bam(open(out, "rb").read())
    assert a.n == b.n
    assert a.records == b.records
