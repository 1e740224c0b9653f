"""FilterAndSortSam: flag-filter + coordinate-sort a single SAM/BAM file
(ref: apps/FilterAndSortSam.c — the samtools-based single-file variant of
BamSort).

Usage: filter_and_sort_sam [--require-flags N] [--exclude-flags N]
                           [--min-mapq N] output.bam input.[sb]am
"""
from __future__ import annotations

import struct
import sys
from typing import List

import numpy as np

from kmernator_tpu.io.bam import (coordinate_sort_order, load_alignments,
                                  write_bam)


def run(argv: List[str]) -> int:
    require = exclude = 0
    min_mapq = 0
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--require-flags":
            require = int(argv[i + 1]); i += 2
        elif a == "--exclude-flags":
            exclude = int(argv[i + 1]); i += 2
        elif a == "--min-mapq":
            min_mapq = int(argv[i + 1]); i += 2
        else:
            args.append(a); i += 1
    if len(args) != 2:
        print("usage: filter_and_sort_sam [options] output.bam input", file=sys.stderr)
        return 1
    out_path, in_path = args

    bd = load_alignments(in_path)
    keep = np.ones(bd.n, dtype=bool)
    if require:
        keep &= (bd.flag & require) == require
    if exclude:
        keep &= (bd.flag & exclude) == 0
    if min_mapq:
        mapq = np.array([bd.records[i][9] for i in range(bd.n)], np.int32)
        keep &= mapq >= min_mapq
    order = coordinate_sort_order(bd)
    order = order[keep[order]]
    with open(out_path, "wb") as f:
        f.write(write_bam(bd, order))
    return 0


def main():
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
