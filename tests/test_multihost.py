"""Real multi-process (jax.distributed over localhost, Gloo collectives)
validation of the multihost runtime — the analogue of the reference's
`mpirun -np N` sweeps (ref: test/runFilterTests.sh:93-128).

Each test spawns N subprocesses with a shared coordinator; every process
holds its own byte-range partition of the input and its own local CPU
devices; the spectrum is sharded over the GLOBAL mesh; output is written
with rank-ordered gathered concatenation."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(nprocs, argv_fn, devs_per_proc=4, timeout=420):
    port = _free_port()
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ, PYTHONPATH=REPO,
                   XLA_FLAGS="--xla_force_host_platform_device_count=%d"
                   % devs_per_proc)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            argv_fn(pid, port), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err.decode()[-3000:]
    return outs


def test_two_process_filter_reads_golden(tmp_path):
    """FilterReads --distributed at 2 processes x 4 devices: gathered
    output must be byte-identical to the reference golden (the
    decomposition-invariance contract)."""
    out = str(tmp_path / "out")

    def argv(pid, port):
        return [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
                "--jax-platform", "cpu",
                "--distributed", "127.0.0.1:%d" % port,
                "--nprocs", "2", "--procid", str(pid),
                "--mesh-batch", "256",
                "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
                "--artifact-edit-distance", "1",
                "--fastq-output-base-quality", "64",
                "--min-read-length", "25",
                "--out", out, "31", os.path.join(REF, "1000.fastq")]

    _spawn(2, argv)
    mine = open(out + "-MinDepth2-1000.fastq", "rb").read()
    want = open(os.path.join(REF, "1000-Filtered.fastq"), "rb").read()
    assert mine == want


_PRIM = r"""
import os, sys
pid, nprocs, port, tmp = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
import jax
jax.config.update("jax_platforms", "cpu")
from kmernator_tpu.parallel import multihost
rank, size = multihost.initialize("127.0.0.1:" + port, nprocs, pid)
assert (rank, size) == (pid, nprocs)
# partitioned load: union of partitions covers every read exactly once
rs = multihost.load_partitioned_reads(["%s/1000.fastq" % "{REF}"])
import numpy as np
from jax.experimental import multihost_utils
counts = multihost_utils.process_allgather(np.array([rs.n], np.int64))
assert int(np.sum(counts)) == 1000, counts
# global mesh + sharded streaming spectrum across processes
mesh = multihost.global_mesh()
assert mesh.devices.size == jax.device_count()
from kmernator_tpu.parallel.mesh_stream import MeshStreamingSpectrum
from kmernator_tpu.io.reads import BASE_CODE
from kmernator_tpu.parallel.device_spectrum import pack_readset
K = 31
L = multihost.allreduce_max_int(max(rs.max_length(), K))
codes, _, lengths = pack_readset(rs, L, 3, 33)
NW = L - K + 1
# SPMD: every process must feed the same LOCAL batch shape — pad the
# shorter partition with empty reads
B = multihost.allreduce_max_int(rs.n)
pad = B - rs.n
codes = np.concatenate([codes, np.zeros((pad, L), codes.dtype)])
lengths = np.concatenate([lengths, np.zeros(pad, lengths.dtype)])
good = np.ones((B, NW), dtype=bool)
sp = MeshStreamingSpectrum(mesh, K, capacity=16384)
sp.add_batch(codes, good, lengths)
keys, cnts = sp.finalize(min_depth=1)
total = int(cnts.sum())
# every process sees the same finalized table
totals = multihost_utils.process_allgather(np.array([total], np.int64))
assert (totals == total).all()
# gathered write: rank-ordered concatenation
multihost.write_gathered(tmp + "/gathered.txt",
                         ("rank%d\n" % rank).encode())
multihost_utils.sync_global_devices("test_done")
if rank == 0:
    data = open(tmp + "/gathered.txt").read()
    assert data == "rank0\nrank1\n", repr(data)
    # stash the spectrum total for the host-side check
    open(tmp + "/total.txt", "w").write(str(total))
print("PRIM-OK", rank)
"""


def test_two_process_primitives(tmp_path):
    """initialize / load_partitioned_reads / global mesh streaming build /
    write_gathered all exercised at process_count == 2."""
    script = tmp_path / "prim.py"
    script.write_text(_PRIM.replace("{REF}", REF))

    def argv(pid, port):
        return [sys.executable, str(script), str(pid), "2", str(port),
                str(tmp_path)]

    outs = _spawn(2, argv, devs_per_proc=2)
    for rc, out, err in outs:
        assert b"PRIM-OK" in out
    # cross-check against the single-process oracle: total good windows
    total = int((tmp_path / "total.txt").read_text())
    from kmernator_tpu.io.reads import load_reads
    from kmernator_tpu.ops.kmer import extract_kmers_flat
    from kmernator_tpu.io.reads import BASE_CODE
    rs = load_reads([REF + "/1000.fastq"])
    codes_raw = BASE_CODE[rs.seq]
    codes = np.where(codes_raw == 4, 0, codes_raw).astype(np.uint8)
    canon, _, _, _ = extract_kmers_flat(codes, rs.offsets, 31)
    assert total == len(canon)


def test_two_process_bam_sort(tmp_path):
    """Distributed BamSort (record exchange over the device mesh) must
    produce the same sorted record stream as the single-process sort on
    10k.bam, plus matching unmapped extractions."""
    single = str(tmp_path / "single.bam")
    dist = str(tmp_path / "dist.bam")
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "kmernator_tpu.apps.bam_sort",
         "--unmapped-reads", str(tmp_path / "s-un.fastq.gz"),
         "--unmapped-read-pairs", str(tmp_path / "s-pairs.fastq.gz"),
         single, REF + "/10k.bam"],
        check=True, env=env, capture_output=True)

    def argv(pid, port):
        return [sys.executable, "-m", "kmernator_tpu.apps.bam_sort",
                "--jax-platform", "cpu",
                "--distributed", "127.0.0.1:%d" % port,
                "--nprocs", "2", "--procid", str(pid),
                "--unmapped-reads", str(tmp_path / "d-un.fastq.gz"),
                "--unmapped-read-pairs", str(tmp_path / "d-pairs.fastq.gz"),
                dist, REF + "/10k.bam"]

    _spawn(2, argv, devs_per_proc=2)

    from kmernator_tpu.io.bam import load_alignments
    from kmernator_tpu.parallel.bam_exchange import sort_key
    a = load_alignments(single)
    b = load_alignments(dist)
    assert a.header_text == b.header_text and a.ref_names == b.ref_names
    assert a.n == b.n
    # same record multiset, both in nondecreasing coordinate order
    assert sorted(a.records) == sorted(b.records)
    kb = sort_key(b)
    assert (np.diff(kb) >= 0).all()
    import gzip
    for nm in ("un", "pairs"):
        sa = sorted(l for l in gzip.open(
            str(tmp_path / ("s-%s.fastq.gz" % nm))).read().split(b"\n") if l)
        sb = sorted(l for l in gzip.open(
            str(tmp_path / ("d-%s.fastq.gz" % nm))).read().split(b"\n") if l)
        assert sa == sb


def test_gathered_logs_two_process(tmp_path):
    """--gathered-logs: every rank's buffered log lines are emitted
    rank-ordered by process 0 only (ref: src/Log.h:79, Options.h:382)."""
    out = str(tmp_path / "out")

    def argv(pid, port):
        return [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
                "--jax-platform", "cpu",
                "--distributed", "127.0.0.1:%d" % port,
                "--nprocs", "2", "--procid", str(pid),
                "--mesh-batch", "256", "--verbose", "1",
                "--gathered-logs", "1",
                "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
                "--artifact-edit-distance", "1",
                "--fastq-output-base-quality", "64",
                "--min-read-length", "25",
                "--out", out, "31", os.path.join(REF, "1000.fastq")]

    outs = _spawn(2, argv)
    err0 = outs[0][2].decode()
    err1 = outs[1][2].decode()
    # both ranks' "loaded N reads" lines appear on rank 0, in rank order
    assert err0.count("loaded") == 2
    assert err0.index("[0]") < err0.index("[1]")
    assert "VERBOSE" not in err1
