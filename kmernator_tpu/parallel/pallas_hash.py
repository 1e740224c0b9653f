"""Pallas TPU open-addressing hash-table insert — the measured experiment
behind the design decision that k-mer counting on TPU is sort-shaped, not
hash-shaped.

The reference's hot container is an open-addressing bucket map
(ref: src/Kmer.h:2161-2299 KmerArrayPair insert/find) and the rebuilt
host runtime proves the same design at ~75 ns/insert with prefetching
(native/io_native.cpp agg_insert).  This module transcribes that insert
loop into a Pallas TPU kernel as faithfully as the hardware allows, so the
alternative to the production sort+scan counter
(parallel/device_spectrum.count_batch) carries a measured number instead
of an assumption.

Architectural analysis (why this loses, confirmed by Mosaic itself):

1. No vector gather/scatter.  A probe of T independent hash slots is T
   sequential scalar loop iterations on the scalar core — the VPU (8x128
   lanes) idles.  The XLA sort keeps all 1024 lanes busy every cycle.
2. Dynamic single-element indexing is not even *expressible* against VMEM:
   Mosaic rejects `ref[pl.ds(h, 1)]` on a VMEM buffer unless the index is
   provably tile-aligned ("cannot statically prove that index in dimension
   0 is a multiple of 1024").  The only dynamically-indexable space is
   SMEM — scalar memory, KBs in size.  A table that must live in SMEM
   caps out around 2^12 slots; the 1 GiB working point needs ~6M keys.
3. The sequential grid conveniently replaces atomics for
   read-modify-write (this kernel is exact), but does nothing for access
   granularity, and an HBM-resident table would add a DMA round-trip per
   probe on top of (1).

This kernel therefore benchmarks the hash design's BEST case: a fully
SMEM-resident table and SMEM-resident keys, zero DMA, exact transcription
of the reference's linear-probe insert.  Measured on the real chip
(TPU v5e, 2026-08-18, 50 chained passes in one dispatch):
**0.875 Mkeys/s** at T=1024 keys / cap=4096 slots vs the production
sort+scan path's 400+ Mkmer/s/chip — a ~450x deficit that no capacity
tuning recovers, because it is an ISA-shape mismatch (scalar-core probe
chains vs 1024 busy vector lanes), not a constant factor.  Run manually:

    KMTPU_HASH_BENCH=1 python -m kmernator_tpu.parallel.pallas_hash
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _insert_kernel(keys_ref, tk_ref, tc_ref, n_ref):
    """Sequential open-addressing insert of the key tile into the
    SMEM-resident table (tk: u32 slot keys, sentinel 0xFFFFFFFF empty;
    tc: u32 counts).  Exact transcription of the reference's linear-probe
    insert (src/Kmer.h:2161-2299) — one scalar probe chain per key."""
    T = keys_ref.shape[0]
    cap = tk_ref.shape[0]
    mask = jnp.uint32(cap - 1)

    def clear_one(s, _):
        tk_ref[s] = jnp.uint32(0xFFFFFFFF)
        tc_ref[s] = jnp.uint32(0)
        return _

    jax.lax.fori_loop(0, cap, clear_one, 0)

    def insert_one(i, n_new):
        key = keys_ref[i]
        h0 = key * jnp.uint32(2654435761) & mask

        def advance(h):
            return (h + jnp.uint32(1)) & mask

        def cond(h):
            slot = tk_ref[h]
            return ~((slot == key) | (slot == jnp.uint32(0xFFFFFFFF)))

        h = jax.lax.while_loop(cond, advance, h0)
        is_new = tk_ref[h] == jnp.uint32(0xFFFFFFFF)
        tk_ref[h] = key
        tc_ref[h] = jnp.where(is_new, jnp.uint32(1), tc_ref[h] + jnp.uint32(1))
        return n_new + is_new.astype(jnp.uint32)

    n_ref[0] = jax.lax.fori_loop(0, T, insert_one, jnp.uint32(0))


def hash_insert(keys: jax.Array, cap: int, interpret: bool = False):
    """Insert all keys (u32) into a fresh cap-slot table; returns
    (table_keys [cap], table_counts [cap], n_unique [1]).  cap is limited
    by SMEM (see module docstring) — this is an experiment, not the
    production counter."""
    assert cap & (cap - 1) == 0, "cap must be a power of two"

    return pl.pallas_call(
        _insert_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap,), jnp.uint32),
            jax.ShapeDtypeStruct((cap,), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.uint32),
        ],
        interpret=interpret,
    )(keys)


def _bench():  # pragma: no cover - manual on-chip experiment
    import time
    N, CAP = 1 << 10, 1 << 12
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 16, N).astype(np.uint32)
    x = jnp.asarray(keys)
    tk, tc, n = hash_insert(x, CAP)
    n0 = int(n[0])  # forces completion through the relay
    steps = 50

    @jax.jit
    def run(x):
        # perturb the low key bit per step so the compiler cannot CSE the
        # 50 pallas_calls into one; every step does the full insert pass
        def body(i, acc):
            xi = x ^ (i & 1).astype(jnp.uint32)
            return acc + hash_insert(xi, CAP)[2][0]
        return jax.lax.fori_loop(0, steps, body, jnp.uint32(0))

    total0 = int(run(x))  # compile + warm
    t0 = time.perf_counter()
    total = int(run(x))   # one dispatch, 50 chained insert passes
    dt = time.perf_counter() - t0
    assert total == total0 and total >= steps * 1
    print("pallas scalar-probe insert: %.3f Mkeys/s (N=%d, cap=%d, "
          "unique0=%d, dt=%.2fs)"
          % (N * steps / dt / 1e6, N, CAP, n0, dt))


if __name__ == "__main__":  # pragma: no cover
    import os
    if os.environ.get("KMTPU_HASH_BENCH"):
        _bench()
