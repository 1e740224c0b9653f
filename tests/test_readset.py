"""ReadSet parse/format round trips and pairing
(ref: test/ReadSetStdTest.cpp, test/ReadSetTest.cpp)."""
import numpy as np

from kmernator_tpu.io.reads import ReadSet, load_reads, format_read

REF = "/root/reference/test"


def roundtrip(rs: ReadSet, output_base: int) -> bytes:
    out = []
    ph = rs.phred()
    for i in range(rs.n):
        out.append(format_read(
            rs.names[i], rs.comments[i],
            rs.seq[rs.offsets[i]:rs.offsets[i + 1]].tobytes(),
            ph[rs.offsets[i]:rs.offsets[i + 1]],
            b"", 0, output_base, 0, 1 << 30, False, bool(rs.has_quals[i])))
    return b"".join(out)


def test_roundtrip_1000_base64():
    rs = load_reads([REF + "/1000.fastq"], output_base_quality=64)
    assert rs.input_qual_base == 64
    assert roundtrip(rs, 64) == open(REF + "/1000.fastq", "rb").read()


def test_roundtrip_1000_std():
    rs = load_reads([REF + "/1000.std.fastq"])
    assert rs.input_qual_base == 33
    assert roundtrip(rs, 33) == open(REF + "/1000.std.fastq", "rb").read()


def test_cross_base_rescale():
    rs = load_reads([REF + "/1000.fastq"])
    assert roundtrip(rs, 33) == open(REF + "/1000.std.fastq", "rb").read()


def test_roundtrip_cs18_std_and_pairing():
    rs = load_reads([REF + "/10-cs18.std.fastq"])
    rs.identify_pairs()
    assert len(rs.pairs) == rs.n // 2
    assert all(r1 >= 0 and r2 >= 0 for r1, r2 in rs.pairs)
    assert roundtrip(rs, 33) == open(REF + "/10-cs18.std.fastq", "rb").read()


def test_split_file_pairing():
    rs = load_reads([REF + "/10-cs18.1.std.fastq", REF + "/10-cs18.2.std.fastq"])
    rs.identify_pairs()
    assert len(rs.pairs) == rs.n // 2
    assert all(r1 >= 0 and r2 >= 0 for r1, r2 in rs.pairs)


def test_casava18_comment_pairing():
    rs = load_reads([REF + "/10-cs18.fastq"])
    rs.identify_pairs()
    assert len(rs.pairs) == rs.n // 2
    assert roundtrip(rs, 64) == open(REF + "/10-cs18.fastq", "rb").read()


def test_fasta_qual():
    # 10.fasta has a sibling 10.qual -> integer phreds are attached
    # (ref: ReadFileReader FastaQualStreamParser)
    rs = load_reads([REF + "/10.fasta"])
    assert rs.n == 10
    assert rs.has_quals.all()
    ph = rs.get_phred(0)
    assert ph[0] == 40 and ph[11] == 16
    fa = load_reads([REF + "/5.fa"])
    assert not fa.has_quals.any()


def _identify_pairs_oracle(rs: ReadSet):
    """Scalar transcription of the reference's identifyPairs loop
    (ref: src/ReadSet.cpp:186-260) for equivalence checks."""
    from kmernator_tpu.io.reads import read_num, common_name
    pairs = []
    paired = np.zeros(rs.n, dtype=bool)
    prev = None
    for i in range(rs.n):
        name, comment = rs.names[i], rs.comments[i]
        if read_num(name, comment) == 0:
            prev = None
            continue
        if prev is not None and common_name(rs.names[prev]) == common_name(name) \
                and read_num(rs.names[prev], rs.comments[prev]) != read_num(name, comment):
            pairs.append([prev, i])
            paired[prev] = paired[i] = True
            prev = None
        else:
            prev = i
    unmatched = {}
    for i in range(rs.n):
        if paired[i]:
            continue
        rn = read_num(rs.names[i], rs.comments[i])
        cn = common_name(rs.names[i])
        if rn and cn in unmatched:
            p = pairs[unmatched.pop(cn)]
            if rn == 2 and p[1] == -1:
                p[1] = i
            elif rn == 1 and p[0] == -1:
                p[0] = i
            else:
                pairs.append([i, -1] if rn != 2 else [-1, i])
            continue
        idx = len(pairs)
        pairs.append([-1, i] if rn == 2 else [i, -1])
        if rn:
            unmatched[cn] = idx
    return [(p[0], p[1]) for p in pairs]


def test_identify_pairs_matches_oracle():
    """Vectorized identify_pairs == scalar oracle on adversarial name sets."""
    rng = np.random.default_rng(3)
    suffixes = [b"/1", b"/2", b"/A", b"/B", b"/F", b"/R", b""]
    casavas = [b"1:N:0:AC", b"2:N:0:AC", b"1:Y:0:", b"2:Y:18:GG", b""]
    for trial in range(30):
        n = int(rng.integers(0, 40))
        names, comments = [], []
        for _ in range(n):
            base = b"rd%d" % rng.integers(0, 8)
            style = rng.integers(0, 4)
            if style == 0:    # suffix pairing
                names.append(base + suffixes[rng.integers(0, len(suffixes))])
                comments.append(b"")
            elif style == 1:  # casava comment pairing
                names.append(base)
                comments.append(casavas[rng.integers(0, len(casavas))])
            elif style == 2:  # short/degenerate names
                names.append([b"", b"a", b"/1", b"ab", b"a/"][rng.integers(0, 5)])
                comments.append(b"")
            else:             # both suffix and comment
                names.append(base + suffixes[rng.integers(0, len(suffixes))])
                comments.append(casavas[rng.integers(0, len(casavas))])
        rs = ReadSet.__new__(ReadSet)
        rs.names = names
        rs.comments = comments
        rs.offsets = np.arange(n + 1, dtype=np.int64)  # 1-base dummy reads
        rs.seq = np.full(n, ord("A"), np.uint8)
        rs.qual = np.full(n, 70, np.uint8)
        rs.discarded = np.zeros(n, bool)
        rs.has_quals = np.ones(n, bool)
        rs.file_idx = np.zeros(n, np.int32)
        rs.input_qual_base = 33
        rs.pairs = []
        rs._phred = None
        rs._lengths = None
        expect = _identify_pairs_oracle(rs)
        rs.identify_pairs()
        assert rs.pairs == expect, (trial, names, comments, rs.pairs, expect)
