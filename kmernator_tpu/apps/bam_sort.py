"""BamSort: merge + coordinate-sort SAM/BAM files, with unmapped-read
extraction to fastq.gz (ref: apps/BamSort-P.cpp + src/SamUtils.h).

Usage: bam_sort [--unmapped-reads out.fastq.gz]
               [--unmapped-read-pairs out.fastq.gz]
               [--keep-unmapped-paired-read true|false]
               output.bam input1.[sb]am [input2 ...]
"""
from __future__ import annotations

import gzip
import sys
from typing import List

import numpy as np

from kmernator_tpu.io.bam import (BamData, coordinate_sort_order,
                                  load_alignments, merge, write_bam)

COMP = bytes.maketrans(b"ACGTacgtN", b"TGCAtgcaN")

FLAG_UNMAPPED = 0x4
FLAG_REVERSE = 0x10
FLAG_READ1 = 0x40
FLAG_READ2 = 0x80


def to_fastq(bd: BamData, i: int) -> bytes:
    name = bd.name(i)
    flag = int(bd.flag[i])
    seq, qual = bd.seq_qual(i)
    if flag & FLAG_REVERSE:
        seq = seq.translate(COMP)[::-1]
        qual = qual[::-1]
    suffix = b""
    if flag & FLAG_READ1:
        suffix = b"/1"
    elif flag & FLAG_READ2:
        suffix = b"/2"
    q = bytes(c + 33 for c in qual)
    return b"@" + name + suffix + b"\n" + seq + b"\n+\n" + q + b"\n"


def run(argv: List[str]) -> int:
    unmapped_reads = None
    unmapped_pairs = None
    keep_unmapped_paired = True
    out_flag = None
    in_flag: List[str] = []
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--unmapped-reads":
            unmapped_reads = argv[i + 1]
            i += 2
        elif a == "--unmapped-read-pairs":
            unmapped_pairs = argv[i + 1]
            i += 2
        elif a == "--keep-unmapped-paired-read":
            keep_unmapped_paired = argv[i + 1].lower() not in ("0", "false")
            i += 2
        elif a == "--output-bam":
            out_flag = argv[i + 1]
            i += 2
        elif a == "--input-bams":
            in_flag.append(argv[i + 1])
            i += 2
        elif a == "--num-partitions":
            i += 2  # MPI redistribution partition count — single-image sort
        else:
            args.append(a)
            i += 1
    if out_flag is not None:
        out_path, inputs = out_flag, in_flag + args
    else:
        if len(args) < 2:
            print("usage: bam_sort [options] output.bam input...",
                  file=sys.stderr)
            return 1
        out_path, inputs = args[0], args[1:]

    bd = merge([load_alignments(p) for p in inputs])
    unmapped = (bd.flag & FLAG_UNMAPPED) != 0
    placed = bd.ref_id >= 0

    fastq_singles = []
    fastq_pairs = []
    keep = np.ones(bd.n, dtype=bool)
    if unmapped_reads or unmapped_pairs:
        for i in np.flatnonzero(unmapped):
            rec = to_fastq(bd, int(i))
            if unmapped_pairs and not placed[i]:
                fastq_pairs.append(rec)
            else:
                fastq_singles.append(rec)
        # BAM retention (ref: SamUtilsTest.sh contracts):
        #  - unplaced unmapped reads always leave the BAM
        #  - placed-but-unmapped reads stay iff keep-unmapped-paired-read
        keep = ~unmapped | (placed & keep_unmapped_paired)

    order = coordinate_sort_order(bd)
    order = order[keep[order]]
    if out_path.endswith(".sam"):
        from kmernator_tpu.io.bam import to_sam_text
        with open(out_path, "wb") as f:
            f.write(to_sam_text(bd, order))
    else:
        with open(out_path, "wb") as f:
            f.write(write_bam(bd, order))

    if unmapped_reads:
        with gzip.open(unmapped_reads, "wb") as f:
            f.write(b"".join(fastq_singles))
    if unmapped_pairs:
        with gzip.open(unmapped_pairs, "wb") as f:
            f.write(b"".join(fastq_pairs))
    return 0


def main():
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
