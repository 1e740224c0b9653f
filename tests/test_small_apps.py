"""Smoke + invariant tests for the smaller applications."""
import os
import subprocess
import sys

import numpy as np

REF = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")


def run_app(mod, args):
    return subprocess.run([sys.executable, "-m", "kmernator_tpu.apps." + mod] + args,
                          check=True, env=ENV, capture_output=True)


def test_fastq2fasta(tmp_path):
    out = str(tmp_path / "o")
    run_app("fastq2fasta", ["--out", out, REF + "/1000.fastq"])
    lines = open(out + "-1000.fasta", "rb").read().splitlines()
    assert len(lines) == 2000
    assert lines[0] == b">1089:8:1:10382:1094/1"
    # unmasked fasta of first read
    orig = open(REF + "/1000.fastq", "rb").read().splitlines()
    assert lines[1] == orig[1]


def test_fastq2fasta_split_pairs(tmp_path):
    out = str(tmp_path / "o")
    run_app("fastq2fasta", ["--split-pairs", "1", "--out", out, REF + "/1000.fastq"])
    l1 = open(out + "-1000-1.fasta", "rb").read().splitlines()
    l2 = open(out + "-1000-2.fasta", "rb").read().splitlines()
    assert len(l1) == len(l2) == 1000
    assert all(x.endswith(b"/1") for x in l1[0::2])
    assert all(x.endswith(b"/2") for x in l2[0::2])


def test_randomly_sample_counts(tmp_path):
    out = str(tmp_path / "s.fastq")
    run_app("randomly_sample", ["--num-samples", "7", "--out", out,
                                REF + "/1000.fastq"])
    recs = open(out, "rb").read().splitlines()
    assert len(recs) == 7 * 2 * 4  # 7 pairs = 14 reads
    run_app("randomly_sample", ["--num-samples", "9", "--by-pair", "0",
                                "--out", out, REF + "/1000.fastq"])
    recs = open(out, "rb").read().splitlines()
    assert len(recs) == 9 * 4


def test_compare_spectrums_self():
    r = run_app("compare_spectrums",
                ["21", REF + "/10.fasta", REF + "/10.fasta"])
    last = r.stdout.decode().strip().splitlines()[-1].split("\t")
    assert last[0] == last[1] == last[2]   # all kmers common
    assert float(last[3]) == 100.0


def test_tnf_distance_vectors():
    r = run_app("tnf_distance", [REF + "/5.fa"])
    lines = r.stdout.decode().strip().splitlines()
    assert lines[0].startswith("Label\tCount\tLength\tAAAA")
    assert len(lines) == 6  # header + 5 seqs
    # 136 canonical tetramers
    assert len(lines[0].split("\t")) == 3 + 136


def test_tnf_inter_distance(tmp_path):
    inter = str(tmp_path / "inter.txt")
    run_app("tnf_distance", ["--inter-distance-file", inter, REF + "/5.fa"])
    rows = open(inter).read().strip().splitlines()
    assert len(rows) == 5
    assert len(rows[4].split("\t")) == 5  # name + 4 distances (LT)


def test_estimate_size():
    r = run_app("estimate_size",
                ["--kmer-subsample", "1", "--max-sample-fraction", "0.9",
                 "--sample-partitions", "30", "21", REF + "/1000.fastq"])
    vals = dict(line.split("\t") for line in r.stdout.decode().strip().splitlines())
    gs = int(vals["estimatedGenomeSize"])
    assert 3000 < gs < 8000  # phiX is 5386; reads cover most of it


def test_fastq2fastaqual_roundtrip(tmp_path):
    out = str(tmp_path / "fq")
    run_app("fastq2fasta", ["--write-qual", "1", "--out", out,
                            REF + "/10.fastq"])
    import sys as _s
    _s.path.insert(0, REPO)
    from kmernator_tpu.io.reads import load_reads
    a = load_reads([out + "-10.fasta"])     # sibling .qual autoloads
    b = load_reads([REF + "/10.fastq"])
    assert np.array_equal(a.seq, b.seq)
    assert np.array_equal(a.phred(), b.phred())


def test_paired_normalization(tmp_path):
    out = str(tmp_path / "nz")
    r = subprocess.run(
        [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
         "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
         "--artifact-edit-distance", "1", "--min-read-length", "0.4",
         "--max-kmer-output-depth", "100", "--out", out, "21",
         REF + "/10-cs18.1.fastq", REF + "/10-cs18.2.fastq"],
        check=True, env=ENV, capture_output=True)
    f1 = out + "-MinDepth2-MaxDepth100-10-cs18.1.fastq"
    f2 = out + "-MinDepth2-MaxDepth100-10-cs18.2.fastq"
    n1 = open(f1, "rb").read().count(b"\n") // 4
    n2 = open(f2, "rb").read().count(b"\n") // 4
    assert n1 == n2 and n1 > 0  # pairs stay together across the two outputs


def test_mask_simple_repeats_smoke(tmp_path):
    """Exercise the simple-repeat artifact table (ref: ktest2 registration
    with --mask-simple-repeats)."""
    out = str(tmp_path / "sr")
    subprocess.run(
        [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
         "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "1",
         "--artifact-edit-distance", "1", "--fastq-output-base-quality", "64",
         "--min-read-length", "25", "--out", out, "21", REF + "/10.fastq"],
        check=True, env=ENV, capture_output=True)
    assert len(open(out + "-MinDepth2-10.fastq", "rb").read()) > 0


def test_owner_hash_balance():
    """Shard routing balance (ref: test/HashTester.cpp's purpose)."""
    import numpy as np
    sys.path.insert(0, REPO)
    from kmernator_tpu.apps.estimate_size import owner_hash_np
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**62, 200000).astype(np.uint64)
    for d in (2, 8, 13):
        counts = np.bincount(owner_hash_np(keys) % np.uint32(d), minlength=d)
        assert counts.min() > 0.9 * len(keys) / d
        assert counts.max() < 1.1 * len(keys) / d


def test_tnf_intra_inter(tmp_path):
    import numpy as np
    rng = np.random.default_rng(2)
    bases = np.frombuffer(b"ACGT", np.uint8)
    paths = []
    for fi, f in enumerate(("gA", "gB")):
        p = [0.4, 0.1, 0.1, 0.4] if fi == 0 else [0.1, 0.4, 0.4, 0.1]
        path = str(tmp_path / (f + ".fasta"))
        with open(path, "wb") as fh:
            for i in range(3):
                seq = bases[rng.choice(4, 5000, p=p)]
                fh.write(b">%s_%d\n" % (f.encode(), i) + seq.tobytes() + b"\n")
        paths.append(path)
    ii = str(tmp_path / "ii.txt")
    run_app("tnf_distance", ["--intra-inter-file", ii, "--window-size", "300",
                             "--window-step", "150"] + paths)
    rows = [l.split("\t") for l in open(ii).read().strip().splitlines()[1:]]
    arr = np.array(rows, dtype=float)

    def mean(col):
        w = arr[:, col]
        return (arr[:, 0] * w).sum() / max(w.sum(), 1)

    assert mean(1) < mean(2)  # intra distances tighter than inter


def test_artifact_reference_file(tmp_path):
    """--artifact-reference-file: user-supplied artifact sequences join the
    24-mer filter table and reads containing them are discarded
    (ref: FilterKnownOddities artifact-reference-file)."""
    art = tmp_path / "myadapter.fasta"
    adapter = "ACGTACGTTTGACCAGTCAGGACT"  # 24 bases
    art.write_text(">custom\n%s\n" % adapter)
    fq = tmp_path / "in.fastq"
    bad = adapter + "A" * 52
    goodr = ("ACCATGATTACGCCAAGCTTGCAT" + "GCCTGCAGGTCGACTCTAGAGGAT"
             + "CCCCGGGTACCGAGCTCGAATTCA")[:76]
    recs = []
    for i in range(30):
        seq = bad if i % 2 == 0 else goodr
        recs.append("@r%d\n%s\n+\n%s\n" % (i, seq, "I" * len(seq)))
    fq.write_text("".join(recs))
    out = str(tmp_path / "o")
    run_app("filter_reads",
            ["--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
             "--artifact-edit-distance", "0",
             "--artifact-reference-file", str(art),
             "--min-read-length", "25", "--out", out, "21", str(fq)])
    kept = open(out + "-MinDepth2-in.fastq").read()
    assert "r1\n" in kept or "@r1" in kept   # clean reads survive
    assert bad not in kept                    # adapter reads are gone
