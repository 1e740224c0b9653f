"""ops/external.py end-to-end with stub assembler binaries: temp-fasta
write, fork, output parse, and best-containing-contig pick
(ref: src/ExternalAssembler.h extendContig, src/Cap3.h:76-123,
src/Newbler.h:90-141; the reference tests its fork machinery in
test/TestForkDaemonMPI.cpp — binaries are likewise not bundled there)."""
import os
import stat

import numpy as np
import pytest

from kmernator_tpu.io.reads import ReadSet
from kmernator_tpu.ops.external import Cap3, Newbler, ExternalOptions

rng = np.random.default_rng(5)
ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)
CONTIG = ACGT[rng.integers(0, 4, 80)].tobytes()
EXTENDED = (ACGT[rng.integers(0, 4, 25)].tobytes() + CONTIG
            + ACGT[rng.integers(0, 4, 30)].tobytes())
UNRELATED = ACGT[rng.integers(0, 4, 200)].tobytes()


def _pool():
    rs = ReadSet()
    for i in range(4):
        s = EXTENDED[i * 10:i * 10 + 60]
        rs.append_read(b"r%d" % i, b"", s, np.full(len(s), 30))
    return rs


def _stub(path, script):
    with open(path, "w") as f:
        f.write(script)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


@pytest.fixture
def stub_dir(tmp_path, monkeypatch):
    d = tmp_path / "bin"
    d.mkdir()
    monkeypatch.setenv("PATH", str(d) + os.pathsep + os.environ["PATH"])
    return d


def test_cap3_stub_picks_containing_contig(stub_dir):
    # the stub "cap3" validates its input pool then emits one contig that
    # properly contains the original plus one decoy that does not
    _stub(stub_dir / "cap3", """#!/bin/sh
grep -q '^>seed1$' "$1" || exit 1
grep -q '^>r0$' "$1" || exit 1
cat > "$1.cap.contigs" <<EOF
>Contig1
%s
>Contig2
%s
EOF
""" % (EXTENDED.decode(), UNRELATED.decode()))
    asm = Cap3(ExternalOptions())
    assert asm.is_available()
    name, seq = asm.extend_contig(b"seed1", CONTIG, _pool())
    assert seq == EXTENDED
    assert name == b"Contig1"


def test_cap3_stub_keeps_original_when_nothing_contains(stub_dir):
    _stub(stub_dir / "cap3", """#!/bin/sh
cat > "$1.cap.contigs" <<EOF
>Contig1
%s
EOF
""" % UNRELATED.decode())
    asm = Cap3(ExternalOptions())
    name, seq = asm.extend_contig(b"seed1", CONTIG, _pool())
    assert (name, seq) == (b"seed1", CONTIG)


def test_cap3_stub_keeps_original_when_no_output(stub_dir):
    _stub(stub_dir / "cap3", "#!/bin/sh\nexit 0\n")
    asm = Cap3(ExternalOptions())
    name, seq = asm.extend_contig(b"seed1", CONTIG, _pool())
    assert (name, seq) == (b"seed1", CONTIG)


def test_newbler_stub_output_layout_and_flags(stub_dir):
    # newbler writes into the -o dir; the stub also asserts the reference
    # flag set (-ml/-mi/-l) arrives (ref: src/Newbler.h:90-141)
    _stub(stub_dir / "runAssembly", """#!/bin/sh
echo "$@" | grep -q -- "-ml 40" || exit 1
echo "$@" | grep -q -- "-mi 90" || exit 1
out=""
while [ $# -gt 1 ]; do
  if [ "$1" = "-o" ]; then out="$2"; fi
  shift
done
mkdir -p "$out"
cat > "$out/454AllContigs.fna" <<EOF
>ext
%s
EOF
""" % EXTENDED.decode())
    asm = Newbler(ExternalOptions())
    assert asm.is_available()
    name, seq = asm.extend_contig(b"seed1", CONTIG, _pool())
    assert seq == EXTENDED


def test_unavailable_binary_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))
    asm = Cap3(ExternalOptions())
    assert not asm.is_available()
    with pytest.raises(RuntimeError):
        asm.extend_contig(b"s", CONTIG, _pool())
