"""Spectrum observability outputs and depth-partitioned selection:
histogram_table (diffed against a hand-transcribed reference-format
table), gc_heat_map, --size-history-file, --partition-by-depth and
--remainder-trim (ref: KmerSpectrum::Histogram src/KmerSpectrum.h:909-1058,
GCCoverageHeatMap :1073-1140, FilterReads.h partitionByDepth loop
:219-268)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from kmernator_tpu.parallel.spectrum import KmerSpectrum

REF = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_histogram_table_matches_hand_transcription():
    """counts [1,2,2,300] / weights [0.9,1.8,1.9,299.5]: every number below
    is hand-computed from the reference's Histogram::toString semantics
    (linear buckets to 256, then log2; cumulative from the top)."""
    sp = KmerSpectrum(k=5)
    sp.keys = np.arange(4, dtype=np.uint64)
    sp.counts = np.array([1, 2, 2, 300], dtype=np.int64)
    sp.weighted = np.array([0.9, 1.8, 1.9, 299.5])
    lines = sp.histogram_table().splitlines()
    assert lines[0] == "Counts, Weights and Directions"
    assert lines[1] == "Counts:\t4\t305.000\t76.250\t"
    assert lines[2] == "Weights:\t4\t304.100\t76.025\t0.997"
    assert lines[3] == ""
    assert lines[4] == ("Bucket\tCumulative\tUnique\t%Unique\tCount\t%Count"
                        "\tWeight\tQualProb\t%Weight")
    # bucket 1: one unique singleton of weight 0.9
    assert lines[5] == "1\t4\t1\t25.000\t1\t0.328\t\t0.900\t0.900\t0.296\t"
    # bucket 2: two uniques, count 4, weight 3.7
    assert lines[6] == "2\t3\t2\t50.000\t4\t1.311\t\t3.700\t0.925\t1.217\t"
    # count 300 lands in the first log bucket (value 2^8 = 256)
    assert lines[-1] == ("256\t1\t1\t25.000\t300\t98.361\t\t299.500\t0.998"
                         "\t98.487\t")


def test_histogram_table_unweighted_defaults_to_counts():
    sp = KmerSpectrum(k=5)
    sp.keys = np.arange(2, dtype=np.uint64)
    sp.counts = np.array([3, 3], dtype=np.int64)
    t = sp.histogram_table()
    assert "Weights:\t2\t6.000\t3.000\t1.000" in t


def test_gc_heat_map_cells():
    """AAAA/AAAC/AACC/ACCC/CCCC at count 1 each: one cell per GC fraction."""
    from kmernator_tpu.ops.kmer import extract_kmers_flat
    from kmernator_tpu.parallel.spectrum import pack_keys
    from kmernator_tpu.io.reads import BASE_CODE
    seq = np.frombuffer(b"AAAACCCC", dtype=np.uint8)
    codes = BASE_CODE[seq]
    canon, _, _, _ = extract_kmers_flat(codes, np.array([0, 8]), 4)
    keys = pack_keys(canon)
    sp = KmerSpectrum.from_observations(4, keys, np.ones(len(keys), bool))
    hm = sp.gc_heat_map().splitlines()
    assert hm[0].startswith("depth\t0")
    assert "\t100" in hm[0]
    # row for coverage 1 holds one kmer at each GC count 0..4
    row1 = hm[2].split("\t")
    assert row1[0] == "1"
    assert [float(x) for x in row1[1:]] == [1.0, 1.0, 1.0, 1.0, 1.0]


def _run_filter(tmp_path, extra, inp="1000.fastq"):
    out = str(tmp_path / "out")
    cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
           "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
           "--artifact-edit-distance", "1", "--min-read-length", "25",
           "--fastq-output-base-quality", "64",
           "--out", out, "31", os.path.join(REF, inp)] + extra
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    subprocess.run(cmd, check=True, env=env, capture_output=True)
    return {f: (tmp_path / f).read_bytes() for f in os.listdir(tmp_path)}


def _names(fastq_bytes):
    return [l.split()[0] for l in fastq_bytes.splitlines()[::4]]


def _scores(fastq_bytes):
    out = []
    for l in fastq_bytes.splitlines()[::4]:
        for tok in l.split():
            if tok.startswith(b"MedianScore:"):
                out.append(int(tok.split(b":")[1]))
    return out


def test_size_history_file(tmp_path):
    files = _run_filter(tmp_path, ["--size-history-file",
                                   str(tmp_path / "hist.tsv")])
    txt = (tmp_path / "hist.tsv").read_text().splitlines()
    assert txt[0] == "rawKmers\trawGoodKmers\tuniqueKmers\tsingletonKmers"
    raw, good, uniq, single = (int(x) for x in txt[1].split("\t"))
    assert raw >= good > 0
    assert uniq > single > 0
    # oracle: the host spectrum build over the same (artifact-filtered)
    # reads the app counts
    from kmernator_tpu.io.reads import load_reads
    from kmernator_tpu.apps.filter_reads import build_spectrum
    from kmernator_tpu.ops.artifact import (ArtifactFilter,
                                            apply_artifact_filter)
    from kmernator_tpu.utils.options import (FilterArtifactOptions,
                                             GeneralOptions)
    aopts, gopts = FilterArtifactOptions(), GeneralOptions()
    rs = load_reads([os.path.join(REF, "1000.fastq")], 0, 64)
    rs.identify_pairs()
    apply_artifact_filter(rs, ArtifactFilter(
        match_length=aopts.artifact_match_length, edit_distance=1,
        build_edits_in_filter=aopts.build_artifact_edits_in_filter,
        mask_simple_repeats=0, phix=False, extra_reference_files=(),
        min_quality=gopts.min_quality_score, min_read_length=25))
    sp = build_spectrum(rs, 31, gopts.min_quality_score, 64, 0.10)
    assert (raw, good) == (sp.raw_kmers, sp.raw_good_kmers)
    assert uniq == len(sp.keys)
    assert single == sp.singleton_count()


def test_partition_by_depth_bands(tmp_path):
    files = _run_filter(tmp_path, ["--partition-by-depth", "8"])
    bands = {f: v for f, v in files.items() if "-PartitionDepth" in f}
    assert set(bands) >= {"out-MinDepth2-PartitionDepth8-1000.fastq",
                          "out-MinDepth2-PartitionDepth4-1000.fastq"}
    # each read appears in exactly one band
    seen = []
    for v in files.values():
        seen.extend(_names(v))
    assert seen and len(seen) == len(set(seen))
    # bands respect their depth floor PER PAIR (a passing pair drags its
    # mate along, ref: pickAllPassingPairs src/ReadSelector.h:576-588):
    # every pair in the Depth8 band has a member scoring >= 8; every pair
    # in the Depth4 band maxes out in [4, 8)
    def pair_maxes(blob):
        best = {}
        for name, sc in zip(_names(blob), _scores(blob)):
            key = name.rsplit(b"/", 1)[0]
            best[key] = max(best.get(key, -1), sc)
        return best
    p8 = pair_maxes(bands["out-MinDepth2-PartitionDepth8-1000.fastq"])
    assert p8 and min(p8.values()) >= 8
    p4 = pair_maxes(bands["out-MinDepth2-PartitionDepth4-1000.fastq"])
    assert p4 and min(p4.values()) >= 4 and max(p4.values()) < 8
    # partitioning reshuffles but never drops or duplicates picks: the
    # union of band pick-names equals the unpartitioned pick-names
    os.makedirs(tmp_path / "flat")
    flat = _run_filter(tmp_path / "flat", [])
    flat_names = set()
    for v in flat.values():
        flat_names.update(_names(v))
    assert set(seen) == flat_names


def test_remainder_trim(tmp_path):
    """Reads quality-trimmed to ~half length fail the strict band length
    but re-qualify in the -Remainder pass at the relaxed --remainder-trim
    length (ref: FilterReads.h:244-263)."""
    rng = np.random.default_rng(9)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = rng.integers(0, 4, 30000, dtype=np.uint8)
    recs = []
    for i in range(1200):
        s = int(rng.integers(0, len(genome) - 100))
        seq = acgt[genome[s:s + 100]].tobytes()
        q = bytearray(b"I" * 100)
        if i % 3 == 0:
            q[45:] = b"#" * 55  # low-quality tail: trims to ~45 bases
        recs.append(b"@s%04d\n%s\n+\n%s\n" % (i, seq, bytes(q)))
    inp = tmp_path / "in.fastq"
    inp.write_bytes(b"".join(recs))
    out = tmp_path / "o"
    os.makedirs(out)
    files = _run_filter(out, ["--partition-by-depth", "8",
                              "--remainder-trim", "30",
                              "--min-read-length", "80"],
                        inp=str(inp))
    rem = [f for f in files if "-Remainder" in f]
    assert rem, "remainder-trim must produce a -Remainder output: %s" % (
        list(files),)
    rem_names = set()
    for f in rem:
        rem_names.update(_names(files[f]))
    band_names = set()
    for f, v in files.items():
        if f not in rem:
            band_names.update(_names(v))
    # the trimmed third lands in the remainder, disjoint from the bands
    assert rem_names and not (rem_names & band_names)
    rem_blob = b"".join(files[f] for f in rem)
    lens = [len(l) for l in rem_blob.splitlines()[1::4]]
    assert lens and max(lens) < 80 and min(lens) >= 30
