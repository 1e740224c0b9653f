"""Benchmark: canonical 31-mer counting throughput per chip.

Measures the fused device spectrum step (extract + canonicalize + weight +
sort-count, parallel/device_spectrum.py) on synthetic reads sampled from a
synthetic genome at ~20x coverage, and compares against a multithreaded C++
single-node open-hash counter (native/baseline_count.cpp) standing in for
the reference's single-node hot path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": N}
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
B = 8192          # reads per device batch
STEPS = 8         # timed steps


def baseline_kmers_per_sec() -> float:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native", "baseline_count.cpp")
    exe = os.path.join(here, "native", "baseline_count")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(["g++", "-O3", "-march=native", "-o", exe, src, "-lpthread"],
                       check=True)
    n_reads = GENOME * COVERAGE // L
    out = subprocess.run([exe, str(n_reads), str(L), str(K), "4", str(GENOME)],
                         check=True, capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("kmers_per_sec="):
            return float(line.split("=")[1])
    raise RuntimeError("baseline produced no rate: %r" % out.stdout)


def tpu_kmers_per_sec() -> float:
    import jax
    import jax.numpy as jnp
    from kmernator_tpu.parallel.device_spectrum import spectrum_step

    dev = jax.devices()[0]
    rng = np.random.default_rng(7)
    # synthetic genome on host; reads sampled at random offsets, then staged
    # to device once (bench isolates the per-chip compute path; host IO is
    # benchmarked separately)
    genome = rng.integers(0, 4, GENOME, dtype=np.uint8)
    starts = rng.integers(0, GENOME - L, B)
    codes_np = genome[starts[:, None] + np.arange(L)[None, :]]
    logp_np = np.full((B, L), np.float32(-0.00144), dtype=np.float32)
    lengths_np = np.full(B, L, dtype=np.int32)

    codes = jax.device_put(jnp.asarray(codes_np), dev)
    logp = jax.device_put(jnp.asarray(logp_np), dev)
    lengths = jax.device_put(jnp.asarray(lengths_np), dev)

    # compile + warm up
    counts, canon, good = spectrum_step(codes, logp, lengths, K)
    counts.block_until_ready()

    n_windows = B * (L - K + 1)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        counts, canon, good = spectrum_step(codes, logp, lengths, K)
    counts.block_until_ready()
    dt = time.perf_counter() - t0
    return n_windows * STEPS / dt


def main():
    value = tpu_kmers_per_sec()
    try:
        base = baseline_kmers_per_sec()
    except Exception:
        base = None
    rec = {
        "metric": "canonical 31-mers counted/sec/chip",
        "value": round(value),
        "unit": "kmers/s",
        "vs_baseline": round(value / base, 2) if base else None,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
