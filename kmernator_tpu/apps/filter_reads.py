"""FilterReads: quality/artifact filtering + k-mer depth trimming of reads.

CLI-compatible re-implementation of the reference FilterReads application
(ref: apps/FilterReads.cpp:83-215, apps/FilterReads.h:158-282): load reads,
identify pairs, artifact-filter, build the k-mer spectrum, score & trim each
read by its k-mer depth profile, then select passing reads/pairs and write
them with reference-identical FASTQ formatting and trim labels.

Usage (reference-compatible):
  python -m kmernator_tpu.apps.filter_reads --kmer-scoring-type MEDIAN \
      --min-read-length 25 --out OUT 31 input.fastq
"""
from __future__ import annotations

import os
import sys
from typing import Dict, List

import numpy as np

from kmernator_tpu.io.reads import ReadSet, load_reads, format_read, BASE_CODE
from kmernator_tpu.ops.artifact import ArtifactFilter, apply_artifact_filter
from kmernator_tpu.ops.kmer import extract_kmers_flat
from kmernator_tpu.ops.trim import ReadTrims, score_and_trim, pick_all_passing
from kmernator_tpu.ops.weights import window_weights, good_kmer_mask
from kmernator_tpu.parallel.spectrum import KmerSpectrum, pack_u64
from kmernator_tpu.utils.logging import Log
from kmernator_tpu.utils.options import (
    GeneralOptions, KmerBaseOptions, KmerSpectrumOptions, ReadSelectorOptions,
    FilterArtifactOptions, DuplicateFilterOptions, FilterReadsOptions, compose)


def file_prefix(path: str) -> str:
    """ref: Options::getInputFileSubstring (src/Options.h:531-551):
    basename up to the last '.'."""
    base = os.path.basename(path)
    dot = base.rfind(".")
    if dot < 0:
        return base[:len(base) - 1] if base else base
    return base[:dot]


def build_spectrum(rs: ReadSet, k: int, min_quality: int, output_base: int,
                   min_kmer_quality: float) -> KmerSpectrum:
    """Extract canonical kmers + exact weights and count good observations.
    Mirrors _buildKmerSpectrumParallel + append()
    (ref: src/KmerSpectrum.h:1932-2074,1578-1668)."""
    codes_raw = BASE_CODE[rs.seq]
    markup = codes_raw == 4
    codes = np.where(markup, 0, codes_raw).astype(np.uint8)
    canon, is_fwd, read_id, pos = extract_kmers_flat(codes, rs.offsets, k)
    keys = pack_u64(canon)
    p = rs.base_probabilities(min_quality, output_base)
    w = window_weights(p, rs.offsets, markup, k)
    good = good_kmer_mask(w, min_kmer_quality)
    # discarded reads contribute nothing (ref: buildWeightedKmers early-out)
    good = good & ~rs.discarded[read_id]
    return KmerSpectrum.from_observations(
        k, keys, good, weights=w.astype(np.float32), is_fwd=is_fwd)


def window_count_lookup(rs: ReadSet, spectrum: KmerSpectrum, k: int):
    """Per-window spectrum counts for scoring (ref: setKmerValues,
    src/ReadSelector.h:1064-1076)."""
    codes_raw = BASE_CODE[rs.seq]
    codes = np.where(codes_raw == 4, 0, codes_raw).astype(np.uint8)
    canon, _, read_id, _ = extract_kmers_flat(codes, rs.offsets, k)
    counts = spectrum.lookup_counts(pack_u64(canon))
    lens = rs.lengths()
    nw = np.maximum(lens - k + 1, 0)
    window_offsets = np.concatenate([[0], np.cumsum(nw)])
    return counts, window_offsets


def first_markup_nor_x(rs: ReadSet) -> np.ndarray:
    """1-based position of the first N or X base per read, 0 = none
    (ref: TwoBitSequence::firstMarkupNorX)."""
    isnx = (rs.seq == ord("N")) | (rs.seq == ord("X"))
    out = np.zeros(rs.n, dtype=np.int64)
    if not isnx.any():
        return out
    # simple per-read scan (vectorize later; N markups are rare)
    for i in range(rs.n):
        s, e = rs.offsets[i], rs.offsets[i + 1]
        w = np.flatnonzero(isnx[s:e])
        if len(w):
            out[i] = int(w[0]) + 1
    return out


def select_and_write(rs: ReadSet, trims: ReadTrims, opts, kopts, sopts, ropts,
                     input_files: List[str]) -> Dict[str, bytes]:
    """selectReads + writePicks (ref: apps/FilterReads.h:158-282,
    src/ReadSelector.h:1242-1262).  Returns {output_path: bytes}."""
    out_name = opts.output_file
    min_depth = sopts.min_depth if kopts.kmer_size > 0 else 0
    suffix = ""
    if ropts.separate_outputs:
        if kopts.kmer_size > 0:
            out_name += "-MinDepth%d" % min_depth
        suffix = ".fastq" if opts.format_output in (0, 2) else ".fasta"

    picks = pick_all_passing(rs, trims, float(min_depth), ropts.min_read_length,
                             ropts.min_passing_in_pair == 2)

    outputs: Dict[str, List[bytes]] = {}
    phred = rs.phred()
    for i in picks:
        key = ""
        if ropts.separate_outputs:
            key = "-" + file_prefix(input_files[rs.file_idx[i]])
        path = out_name + key + suffix
        rec = format_read(
            rs.names[i], rs.comments[i],
            rs.seq[rs.offsets[i]:rs.offsets[i + 1]].tobytes(),
            phred[rs.offsets[i]:rs.offsets[i + 1]],
            trims.label[i], opts.format_output, opts.fastq_output_base_quality,
            int(trims.offset[i]), int(trims.length[i]),
            bool(rs.discarded[i]), bool(rs.has_quals[i]),
            comment_stored=opts.keep_read_comment)
        outputs.setdefault(path, []).append(rec)
    return {path: b"".join(recs) for path, recs in outputs.items()}


def run(argv: List[str]) -> int:
    opts = GeneralOptions()
    kopts = KmerBaseOptions()
    sopts = KmerSpectrumOptions()
    ropts = ReadSelectorOptions()
    aopts = FilterArtifactOptions()
    dopts = DuplicateFilterOptions()
    fopts = FilterReadsOptions()
    # FilterReads aliases --out for --output-file (test scripts use --out)
    argv = ["--output-file" if a == "--out" else a for a in argv]
    compose([opts, kopts, sopts, ropts, aopts, dopts, fopts], argv,
            positional=["kmer-size", "input-file"])
    Log.verbose_level = opts.verbose
    Log.debug_level = opts.debug

    if not opts.input_file:
        Log.error("Please specify at least one input file")
        return 1

    Log.verbose(1, "Reading input files")
    rs = load_reads(opts.input_file, opts.fastq_base_quality,
                    opts.fastq_output_base_quality, opts.keep_read_comment)
    Log.verbose(1, "loaded %d reads" % rs.n)
    rs.identify_pairs()

    if not aopts.skip_artifact_filter:
        filt = ArtifactFilter(
            match_length=aopts.artifact_match_length,
            edit_distance=aopts.artifact_edit_distance,
            build_edits_in_filter=aopts.build_artifact_edits_in_filter,
            mask_simple_repeats=aopts.mask_simple_repeats,
            phix=aopts.phix_output,
            extra_reference_files=aopts.artifact_reference_file,
            min_quality=opts.min_quality_score,
            min_read_length=ropts.min_read_length)
        out = apply_artifact_filter(rs, filt)
        Log.verbose(1, "filter affected (trimmed/removed) %d reads" % out.affected)

    k = kopts.kmer_size
    if k > 0:
        if sopts.load_kmer_mmap:
            spectrum = KmerSpectrum.load(sopts.load_kmer_mmap)
        else:
            spectrum = build_spectrum(rs, k, opts.min_quality_score,
                                      opts.fastq_output_base_quality,
                                      sopts.min_kmer_quality)
            # weak-map visibility: singletons are never consulted by the
            # selector (ref: FilterReads.cpp:196 binds spectrum.weak)
            spectrum.purge_min_depth(max(sopts.min_depth, 2))
            if sopts.save_kmer_mmap and opts.output_file:
                spectrum.save(opts.output_file + "-mmap")
                # np.savez appends .npz; keep the bare name for reload parity
                if os.path.exists(opts.output_file + "-mmap.npz"):
                    os.replace(opts.output_file + "-mmap.npz", opts.output_file + "-mmap")
        Log.verbose(1, "spectrum: %d unique kmers" % spectrum.n_unique)
        counts, w_off = window_count_lookup(rs, spectrum, k)
        trims = score_and_trim(rs, counts, w_off, k, float(sopts.min_depth),
                               ropts.kmer_scoring_type, first_markup_nor_x(rs))
    else:
        trims = _trim_by_markup(rs)

    if opts.output_file:
        outputs = select_and_write(rs, trims, opts, kopts, sopts, ropts,
                                   opts.input_file)
        for path, data in outputs.items():
            with open(path, "wb") as f:
                f.write(data)
            Log.verbose(1, "wrote %s (%d bytes)" % (path, len(data)))
    return 0


def _trim_by_markup(rs: ReadSet) -> ReadTrims:
    """kmer-size == 0 path: trim at first markup
    (ref: trimReadByMarkupLength, src/ReadSelector.h:933-946)."""
    n = rs.n
    lens = rs.lengths()
    mk = first_markup_nor_x(rs)
    off = np.zeros(n, dtype=np.int64)
    length = np.where(mk != 0, mk - 1, lens)
    score = length.astype(np.float64)
    labels = [b""] * n
    for i in range(n):
        if rs.discarded[i]:
            length[i] = 0
            score[i] = 0.0
            continue
        lab = b""
        if mk[i] != 0:
            lab += b"Trim:%d+%d " % (0, length[i])
        lab += b"Score:%d" % int(score[i] + 0.5)
        labels[i] = lab
    return ReadTrims(off, length, score, labels, np.ones(n, dtype=bool))


def main():
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
