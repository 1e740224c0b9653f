"""MeraculousCounter: k-mer count + extension-graph dumps for Meraculous.

Re-implements apps/MeraculousCounter.cpp + src/Meraculous.h: builds the
spectrum with extension tracking (minimumWeight = 0, min quality 2) and
writes <out>.mercount.m<k> (canonical kmer + revcomp, each with the total
count) and <out>.mergraph.m<k>.D<minDepth> (kmer + 13 extension counters).
The reference emits in hash-bucket order and its test sorts before diffing
(ref: test/runMeraculousTests.sh:52-60); we emit in sorted canonical-key
order.
"""
from __future__ import annotations

import sys
from typing import List

import numpy as np

from kmernator_tpu.io.reads import ReadSet, load_reads, BASE_CODE
from kmernator_tpu.ops.extensions import window_extensions, EXT_MIN_QUALITY
from kmernator_tpu.ops.kmer import extract_kmers_flat, kmer_to_string, nwords, revcomp_words
from kmernator_tpu.ops.weights import window_weights, good_kmer_mask
from kmernator_tpu.parallel.spectrum import KmerSpectrum, pack_u64, unpack_u64
from kmernator_tpu.utils.logging import Log
from kmernator_tpu.utils.options import (GeneralOptions, KmerBaseOptions,
                                         KmerSpectrumOptions, compose)

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def build_extension_spectrum(rs: ReadSet, k: int, min_quality: int,
                             output_base: int, min_kmer_quality: float) -> KmerSpectrum:
    codes_raw = BASE_CODE[rs.seq]
    markup = codes_raw == 4
    codes = np.where(markup, 0, codes_raw).astype(np.uint8)
    canon, is_fwd, read_id, _ = extract_kmers_flat(codes, rs.offsets, k)
    keys = pack_u64(canon)
    p = rs.base_probabilities(min_quality, output_base)
    w = window_weights(p, rs.offsets, markup, k)
    good = good_kmer_mask(w, min_kmer_quality)
    good &= ~rs.discarded[read_id]
    phred = rs.phred()
    hq = np.repeat(rs.has_quals, rs.lengths())
    ext_ok = (phred >= EXT_MIN_QUALITY) | ~hq
    el, er = window_extensions(codes.astype(np.int64), ext_ok, rs.offsets, k, is_fwd)
    return KmerSpectrum.from_observations(k, keys, good,
                                          weights=w.astype(np.float32),
                                          is_fwd=is_fwd, ext_left=el, ext_right=er)


def kmer_strings(keys: np.ndarray, k: int):
    """Vectorized decode of u64 canonical keys + their reverse complements
    to byte strings [M, k]."""
    W = nwords(k)
    words = unpack_u64(keys, W)
    rc = revcomp_words(np, words, k)

    def decode(ws):
        M = len(ws)
        out = np.zeros((M, k), dtype=np.uint8)
        for i in range(k):
            wi, o = divmod(i, 16)
            out[:, i] = _BASES[(ws[:, wi] >> np.uint32(30 - 2 * o)) & np.uint32(3)]
        return out

    return decode(words), decode(rc)


def dump_counts(spectrum: KmerSpectrum, path: str, min_depth: int):
    """ref: MeraculousDistributedKmerSpectrum::dumpCounts (Meraculous.h:107-120)."""
    keep = spectrum.counts >= min_depth
    keys = spectrum.keys[keep]
    counts = spectrum.counts[keep]
    fwd, rc = kmer_strings(keys, spectrum.k)
    with open(path, "wb") as f:
        for i in range(len(keys)):
            c = b"%d" % counts[i]
            f.write(fwd[i].tobytes() + b"\t" + c + b"\n")
            f.write(rc[i].tobytes() + b"\t" + c + b"\n")


def dump_graphs(spectrum: KmerSpectrum, path: str, min_depth: int):
    """ref: dumpGraphs (Meraculous.h:121-133): 2x6 left/right extension
    counters + trailing 0; the revcomp line swaps directions and complements
    bases (ExtensionTracking::getReverseComplement)."""
    keep = spectrum.counts >= min_depth
    keys = spectrum.keys[keep]
    ext = spectrum.extensions[keep]
    fwd, rc = kmer_strings(keys, spectrum.k)
    # reverse-complemented counters: revLeft[rc(b)] = right[b], revRight[rc(b)] = left[b]
    perm = [3, 2, 1, 0, 4, 5]  # A<->T, C<->G, N, X
    rev_ext = np.zeros_like(ext)
    for b in range(6):
        rev_ext[:, perm[b]] = ext[:, 6 + b]
        rev_ext[:, 6 + perm[b]] = ext[:, b]
    with open(path, "wb") as f:
        for i in range(len(keys)):
            vals = b" ".join(b"%d" % v for v in ext[i]) + b" 0"
            rvals = b" ".join(b"%d" % v for v in rev_ext[i]) + b" 0"
            f.write(fwd[i].tobytes() + b"\t" + vals + b"\n")
            f.write(rc[i].tobytes() + b"\t" + rvals + b"\n")


def run(argv: List[str]) -> int:
    opts = GeneralOptions()
    opts.min_quality_score = 2      # ref: MeraculousCounter _resetDefaults
    kopts = KmerBaseOptions()
    sopts = KmerSpectrumOptions()
    sopts.min_kmer_quality = 0.0
    argv = ["--output-file" if a == "--out" else a for a in argv]
    compose([opts, kopts, sopts], argv, positional=["input-file"])
    Log.verbose_level = opts.verbose

    k = kopts.kmer_size
    if k == 0:
        Log.error("The Kmer size can not be 0")
        return 1
    rs = load_reads(opts.input_file, opts.fastq_base_quality,
                    opts.fastq_output_base_quality, opts.keep_read_comment)
    spectrum = build_extension_spectrum(rs, k, opts.min_quality_score,
                                        opts.fastq_output_base_quality,
                                        sopts.min_kmer_quality)
    spectrum.purge_min_depth(2)  # weak-map visibility
    out = opts.output_file
    dump_counts(spectrum, "%s.mercount.m%d" % (out, k), sopts.min_depth)
    dump_graphs(spectrum, "%s.mergraph.m%d.D%d" % (out, k, sopts.min_depth),
                sopts.min_depth)
    return 0


def main():
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
