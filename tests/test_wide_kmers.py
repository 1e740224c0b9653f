"""k > 32 (multi-word 'S' byte keys) end-to-end coverage: the reference
supports kmers up to 95 bases (ref: src/Kmer.h:415-416 MAX_KMER_SIZE); the
wide-key paths must behave identically to the u64 paths."""
import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference/test"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_filter_reads_k33_host_vs_mesh(tmp_path):
    """FilterReads at k=33: mesh (wide-key device counting) must be
    byte-identical to the host path."""
    env = dict(os.environ, PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    outs = {}
    for tag, extra in (("host", []), ("mesh", ["--mesh", "4"])):
        out = str(tmp_path / tag)
        cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
               "--jax-platform", "cpu",
               "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
               "--artifact-edit-distance", "1",
               "--fastq-output-base-quality", "64", "--min-read-length", "25",
               "--out", out] + extra + ["33", os.path.join(REF, "1000.fastq")]
        subprocess.run(cmd, check=True, env=env, capture_output=True)
        outs[tag] = open(out + "-MinDepth2-1000.fastq", "rb").read()
    assert outs["host"] == outs["mesh"]
    assert len(outs["host"]) > 10000


def test_spectrum_wide_keys_roundtrip():
    """Wide-key spectrum: counts + save/load + lookup on 'S12' keys."""
    import jax
    from kmernator_tpu.io.reads import load_reads, BASE_CODE
    from kmernator_tpu.ops.kmer import extract_kmers_flat
    from kmernator_tpu.parallel.spectrum import (KmerSpectrum, pack_keys,
                                                 unpack_keys)
    k = 40
    rs = load_reads([REF + "/1000.fastq"])
    codes_raw = BASE_CODE[rs.seq]
    codes = np.where(codes_raw == 4, 0, codes_raw).astype(np.uint8)
    canon, is_fwd, read_id, _ = extract_kmers_flat(codes, rs.offsets, k)
    keys = pack_keys(canon)
    assert keys.dtype == np.dtype("S12")
    good = np.ones(len(keys), bool)
    sp = KmerSpectrum.from_observations(k, keys, good)
    assert sp.counts.sum() == len(keys)
    # pack/unpack roundtrip preserves words
    back = unpack_keys(sp.keys, 3)
    assert (pack_keys(back) == sp.keys).all()
    # string oracle on a sample: keys decode to k-base strings
    assert sp.lookup_counts(sp.keys[:100]).min() >= 1
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        sp.save(os.path.join(d, "wide.npz"))
        sp2 = KmerSpectrum.load(os.path.join(d, "wide.npz"))
        assert (sp2.keys == sp.keys).all() and (sp2.counts == sp.counts).all()


def test_match_index_wide():
    from kmernator_tpu.io.reads import load_reads, BASE_CODE
    from kmernator_tpu.ops.match import KmerReadIndex
    k = 48
    rs = load_reads([REF + "/1000.fastq"])
    idx = KmerReadIndex(rs, k, min_depth=1)
    codes_raw = BASE_CODE[np.frombuffer(rs.get_seq(0), np.uint8)]
    codes = np.where(codes_raw == 4, 0, codes_raw).astype(np.uint8)
    hits = idx.match_contig(codes, max_positions_from_edge=500)
    assert 0 in hits


def test_meraculous_mesh_wide_matches_host(tmp_path):
    """MeraculousCounter k=33: mesh extension spectrum == host table."""
    env = dict(os.environ, PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    outs = {}
    for tag, extra in (("host", []), ("mesh", ["--mesh", "4"])):
        out = str(tmp_path / tag)
        cmd = [sys.executable, "-m", "kmernator_tpu.apps.meraculous_counter",
               "--jax-platform", "cpu", "--kmer-size", "33",
               "--min-depth", "2", "--out", out] + extra + \
              [os.path.join(REF, "1000.fastq")]
        subprocess.run(cmd, check=True, env=env, capture_output=True)
        outs[tag] = {
            "count": sorted(open(out + ".mercount.m33").readlines()),
            "graph": sorted(open(out + ".mergraph.m33.D2").readlines()),
        }
    assert outs["host"]["count"] == outs["mesh"]["count"]
    assert outs["host"]["graph"] == outs["mesh"]["graph"]
    assert len(outs["host"]["count"]) > 1000


def test_filter_reads_k33_streaming_parallel(tmp_path):
    """FilterReads at k=33 through --streaming with the worker pool: every
    native kernel falls back to numpy for wide keys; the output must match
    the in-memory host path record-for-record (chunking only permutes
    per-chunk remnant placement)."""
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    outs = {}
    for tag, extra in (("host", []),
                       ("stream", ["--streaming", "--threads", "3",
                                   "--streaming-chunk-mb", "0.05",
                                   "--streaming-parts", "3"])):
        out = str(tmp_path / tag)
        cmd = [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
               "--jax-platform", "cpu",
               "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
               "--artifact-edit-distance", "1",
               "--fastq-output-base-quality", "64", "--min-read-length", "25",
               "--out", out] + extra + ["33", os.path.join(REF, "1000.fastq")]
        subprocess.run(cmd, check=True, env=env, capture_output=True)
        outs[tag] = open(out + "-MinDepth2-1000.fastq", "rb").read()

    def recs(b):
        lines = b.split(b"\n")
        return sorted(b"\n".join(lines[i:i + 4])
                      for i in range(0, len(lines) - 1, 4))
    assert recs(outs["host"]) == recs(outs["stream"])
    assert len(outs["host"]) > 10000


def test_filter_reads_k33_streaming_distributed(tmp_path):
    """The flagship composition at k=33 (wide 'S' keys): 2-process
    --streaming --distributed byte-identical to the single-process
    streaming engine — completes the wide-key x composition matrix
    (ref: src/Kmer.h:415-416 wide kmers through the MPI build of
    src/DistributedFunctions.h:333-458)."""
    from test_multihost import _spawn

    flags = ["--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
             "--artifact-edit-distance", "1",
             "--fastq-output-base-quality", "64", "--min-read-length", "25"]
    ref_in = os.path.join(REF, "1000.fastq")
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("JAX_PLATFORMS", None)
    single = str(tmp_path / "single")
    subprocess.run([sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
                    "--jax-platform", "cpu", "--streaming",
                    "--streaming-chunk-mb", "0.05", "--threads", "1"]
                   + flags + ["--out", single, "33", ref_in],
                   check=True, env=env, capture_output=True)

    out = str(tmp_path / "dist")

    def argv(pid, port):
        return [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
                "--jax-platform", "cpu", "--streaming",
                "--streaming-chunk-mb", "0.05",
                "--distributed", "127.0.0.1:%d" % port,
                "--nprocs", "2", "--procid", str(pid),
                "--mesh-batch", "64"] + flags + ["--out", out, "33", ref_in]

    _spawn(2, argv)
    mine = open(out + "-MinDepth2-1000.fastq", "rb").read()
    sgl = open(single + "-MinDepth2-1000.fastq", "rb").read()
    assert mine == sgl
    assert len(mine) > 10000
