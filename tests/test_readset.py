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
