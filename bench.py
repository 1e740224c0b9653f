"""Benchmark: canonical 31-mer spectrum-build throughput per chip.

Measures the full device counting path — canonical window extraction,
log-space quality weighting, and the sort/scan spectrum count
(parallel/device_spectrum.py) — on synthetic reads sampled from a synthetic
genome at ~20x coverage.  Steps are dispatched pipelined (the steady-state
streaming regime): each step's unique-key count accumulates into a device
scalar, and the single host readback at the end forces completion of ALL
steps before the clock stops (the axon transport does not block on
block_until_ready alone, so completion is always forced via readback).

Baseline: a multithreaded C++ open-addressing counter
(native/baseline_count.cpp) standing in for the reference's single-node hot
path, run on the same host over the same workload shape.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": N,
   "e2e_metric": ..., "e2e_value": N, "e2e_vs_baseline": N}
The e2e_* fields track BASELINE.json's second metric (reads filtered/sec
at 1 host): a timed streaming FilterReads run over a generated 1 GiB
FASTQ vs the C++ baseline_filter stand-in (see e2e_reads_per_sec below).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

K = 31
L = 100
GENOME = 2_000_000
COVERAGE = 20
# reads per device batch: matches io/stream.FastqBatchStream's default —
# the streaming pipeline's actual regime.  XLA's sort is O(N log^2 N), so
# smaller batches count faster per window (measured on-chip: 311 Mk/s at
# B=131072 -> ~400 Mk/s at B=8192; collapse below 4096 on dispatch
# overheads); the merge cadence is row-count driven, so total merge work
# is independent of B.
B = 8192
STEPS = 160       # same total windows as the round-1 10x131072 regime


def baseline_kmers_per_sec() -> float:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native", "baseline_count.cpp")
    exe = os.path.join(here, "native", "baseline_count")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(["g++", "-O3", "-march=native", "-o", exe, src,
                        "-lpthread"], check=True)
    n_reads = GENOME * COVERAGE // L
    best = 0.0
    for _ in range(3):  # take the baseline's best run (conservative ratio)
        out = subprocess.run([exe, str(n_reads), str(L), str(K), "4",
                              str(GENOME)], check=True, capture_output=True,
                             text=True)
        for line in out.stdout.splitlines():
            if line.startswith("kmers_per_sec="):
                best = max(best, float(line.split("=")[1]))
    if not best:
        raise RuntimeError("baseline produced no rate: %r" % out.stdout)
    return best


def tpu_kmers_per_sec() -> float:
    from kmernator_tpu.utils.jaxconfig import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from kmernator_tpu.parallel.device_spectrum import (count_batch,
                                                       extract_canonical_cols,
                                                       window_good)

    @jax.jit
    def build(codes, logp, lengths):
        cols, is_fwd, valid = extract_canonical_cols(codes, lengths, K)
        wsum, good = window_good(logp, lengths, K, -3.3219281)
        g = (good & valid).reshape(-1)
        keys, counts, n_unique = count_batch(
            [c.reshape(-1) for c in cols], g, 1)
        return n_unique

    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, GENOME, dtype=np.uint8)
    starts = rng.integers(0, GENOME - L, B)
    codes = jnp.asarray(genome[starts[:, None] + np.arange(L)[None, :]])
    logp = jnp.full((B, L), np.float32(-0.00144), dtype=jnp.float32)
    lengths = jnp.full(B, L, dtype=jnp.int32)

    # compile + warm (forced completion via host readback)
    n = int(build(codes, logp, lengths))
    assert 0 < n <= B * (L - K + 1)
    n = int(build(codes, logp, lengths))

    n_windows = B * (L - K + 1)
    t0 = time.perf_counter()
    acc = jnp.int32(0)
    for _ in range(STEPS):
        acc = acc + build(codes, logp, lengths)
    total = int(acc)  # single readback forces completion of every step
    dt = time.perf_counter() - t0
    assert total == STEPS * n, (total, n)
    return n_windows * STEPS / dt


# ---- secondary metric: end-to-end FilterReads throughput (1 host) ----
#
# BASELINE.json's second metric ("reads filtered/sec at 1/N hosts").
# Input: a generated Illumina-like FASTQ (default 1 GiB; KMTPU_E2E_MB
# overrides).  Ours: the streaming host engine (bounded memory, fork
# worker pool) at MEDIAN/min-depth-2 — the 1000.fastq golden config.
# Baseline: native/baseline_filter.cpp, a multithreaded C++ parse ->
# count -> median-score -> write pipeline that deliberately does LESS
# work per read (no artifact filter, no pairing) — a generous stand-in,
# since the reference itself does not build here (Boost/MPI absent).

E2E_MB = int(os.environ.get("KMTPU_E2E_MB", "1024"))
E2E_L = 100


def e2e_input_path() -> str:
    path = "/tmp/kmtpu-bench-e2e-%dmb.fastq" % E2E_MB
    if os.path.exists(path) and os.path.getsize(path) > E2E_MB * 990000:
        return path
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, 5_000_000, dtype=np.uint8)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_reads = int(E2E_MB * 1e6 / 215)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        done = 0
        while done < n_reads:
            b = min(100000, n_reads - done)
            starts = rng.integers(0, len(genome) - E2E_L, b)
            codes = genome[starts[:, None] + np.arange(E2E_L)[None, :]].copy()
            err = rng.random((b, E2E_L)) < 0.003
            codes[err] = (codes[err] + rng.integers(1, 4, err.sum())) % 4
            q = np.clip(rng.normal(37, 3, (b, E2E_L)), 2, 40).astype(np.uint8)
            low = rng.random((b, E2E_L)) < 0.01
            q[low] = rng.integers(2, 15, low.sum())
            q += 33
            f.write(b"".join(
                b"@r%d\n%s\n+\n%s\n" % (done + i, s, qq) for i, (s, qq) in
                enumerate(zip(acgt[codes], q))))
            done += b
    os.replace(tmp, path)
    return path


def e2e_reads_per_sec():
    here = os.path.dirname(os.path.abspath(__file__))
    path = e2e_input_path()
    n_reads = int(E2E_MB * 1e6 / 215)
    out = "/tmp/kmtpu-bench-e2e-out"
    env = dict(os.environ, PYTHONPATH=here)
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, "-m", "kmernator_tpu.apps.filter_reads",
         "--jax-platform", "cpu", "--streaming",
         "--kmer-scoring-type", "MEDIAN", "--mask-simple-repeats", "0",
         "--artifact-edit-distance", "1", "--min-read-length", "25",
         "--out", out, "31", path],
        check=True, env=env, capture_output=True, timeout=1800)
    dt = time.perf_counter() - t0
    for f in os.listdir("/tmp"):
        if f.startswith("kmtpu-bench-e2e-out"):
            os.unlink("/tmp/" + f)
    return n_reads / dt


def e2e_baseline_reads_per_sec() -> float:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native", "baseline_filter.cpp")
    exe = os.path.join(here, "native", "baseline_filter")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(["g++", "-O3", "-march=native", "-o", exe, src,
                        "-lpthread"], check=True)
    best = 0.0
    for _ in range(2):  # best-of-2: a conservative ratio on a noisy VM
        out = subprocess.run(
            [exe, e2e_input_path(), "31", "4", "2", "/tmp/kmtpu-bench-bf-out"],
            check=True, capture_output=True, text=True, timeout=1800)
        for line in out.stdout.splitlines():
            if line.startswith("reads_per_sec="):
                best = max(best, float(line.split("=")[1]))
    os.unlink("/tmp/kmtpu-bench-bf-out")
    if not best:
        raise RuntimeError("baseline_filter produced no rate")
    return best


def tpu_kmers_per_sec_guarded() -> float:
    """tpu_kmers_per_sec in a subprocess with a timeout and one retry —
    the shared dev relay occasionally stalls mid-run, and a hung in-process
    jax call cannot be interrupted; a stalled attempt must not eat the
    whole bench."""
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    last = None
    for _ in range(2):
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import bench; print('RATE=%.1f' % bench.tpu_kmers_per_sec())"],
                env=env, capture_output=True, text=True, timeout=900)
            for line in out.stdout.splitlines():
                if line.startswith("RATE="):
                    return float(line.split("=")[1])
            last = RuntimeError("no rate in output: %r" % out.stdout[-500:])
        except subprocess.TimeoutExpired as e:
            last = e
    raise last


def main():
    try:
        value = tpu_kmers_per_sec_guarded()
    except Exception:
        # the shared dev relay can be down for hours; a partial record
        # (e2e still measured on host) beats an empty one
        value = None
    try:
        base = baseline_kmers_per_sec()
    except Exception:
        base = None
    rec = {
        "metric": "canonical 31-mers counted/sec/chip",
        "value": round(value) if value else None,
        "unit": "kmers/s",
        "vs_baseline": round(value / base, 2) if (value and base) else None,
    }
    try:
        e2e = e2e_reads_per_sec()
        rec["e2e_metric"] = "reads filtered/sec (1 host, %d MB)" % E2E_MB
        rec["e2e_value"] = round(e2e)
        try:
            e2e_base = e2e_baseline_reads_per_sec()
            rec["e2e_vs_baseline"] = round(e2e / e2e_base, 2)
        except Exception:
            rec["e2e_vs_baseline"] = None
    except Exception:
        rec["e2e_value"] = None
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
