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
  {"metric": ..., "value": N, "unit": "kmers/s", "vs_baseline": N}
"""
import json
import os
import subprocess
import time

import numpy as np

K = 31
L = 100
GENOME = 2_000_000
COVERAGE = 20
B = 131072        # reads per device batch (~9.2M windows)
STEPS = 10


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
