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

Architectural analysis (why this is expected to lose):

1. No vector gather/scatter.  Mosaic exposes dynamic indexing only as
   scalar-indexed slices (`ref[pl.ds(h, 1)]`); a probe of T independent
   hash slots is T sequential scalar loop iterations on the scalar core —
   the VPU (8x128 lanes) idles.  The XLA sort keeps all 1024 lanes busy
   every cycle.
2. The TPU grid is sequential, which conveniently replaces atomics for
   read-modify-write (this kernel is exact), but does nothing for access
   granularity.
3. A real spectrum table (~6M keys at the 1 GiB working point) exceeds
   VMEM (16 MiB); HBM-resident probes would add a DMA round-trip per
   probe on top of (1).  This kernel therefore benchmarks the BEST case:
   a VMEM-resident table.

Measured verdict (fill in when the dev relay is up; see bench note in
README): scalar-probe inserts are expected in the ~5-15 Mkey/s range vs
the production sort+scan path's measured ~400 Mkmer/s/chip — a ~30-80x
deficit that no capacity tuning recovers, because it is an ISA-shape
mismatch, not a constant factor.  Run manually:

    KMTPU_HASH_BENCH=1 python -m kmernator_tpu.parallel.pallas_hash
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _insert_kernel(keys_ref, tk_ref, tc_ref, n_ref):
    """Sequential open-addressing insert of one key tile into the
    VMEM-resident table (tk: u32 slot keys, sentinel 0xFFFFFFFF empty;
    tc: u32 counts).  Exact transcription of the reference's linear-probe
    insert (src/Kmer.h:2161-2299) — one scalar probe chain per key."""
    T = keys_ref.shape[0]
    cap = tk_ref.shape[0]
    mask = jnp.uint32(cap - 1)

    def insert_one(i, n_new):
        key = keys_ref[i]
        h0 = key * jnp.uint32(2654435761) & mask

        def probe(state):
            h, done, new = state
            slot = tk_ref[h]
            return h, (slot == key) | (slot == jnp.uint32(0xFFFFFFFF)), new

        def advance(state):
            h, done, new = state
            return (h + jnp.uint32(1)) & mask, done, new

        def cond(state):
            h, done, new = state
            slot = tk_ref[h]
            return ~((slot == key) | (slot == jnp.uint32(0xFFFFFFFF)))

        h, _, _ = jax.lax.while_loop(
            cond, advance, (h0, jnp.bool_(False), n_new))
        slot = tk_ref[h]
        is_new = slot == jnp.uint32(0xFFFFFFFF)
        tk_ref[h] = key
        tc_ref[h] = jnp.where(is_new, jnp.uint32(1), tc_ref[h] + 1)
        return n_new + is_new.astype(jnp.uint32)

    n_ref[0] = n_ref[0] + jax.lax.fori_loop(
        0, T, insert_one, jnp.uint32(0))


def hash_insert(keys: jax.Array, cap: int, interpret: bool = False):
    """Insert all keys (u32) into a fresh cap-slot table; returns
    (table_keys [cap], table_counts [cap], n_unique [1])."""
    assert cap & (cap - 1) == 0, "cap must be a power of two"
    T = keys.shape[0]

    def kernel(keys_ref, tk_ref, tc_ref, n_ref):
        # zero-init on first (only) grid step, then insert
        tk_ref[...] = jnp.full((cap,), 0xFFFFFFFF, jnp.uint32)
        tc_ref[...] = jnp.zeros((cap,), jnp.uint32)
        n_ref[...] = jnp.zeros((1,), jnp.uint32)
        _insert_kernel(keys_ref, tk_ref, tc_ref, n_ref)

    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((cap,), jnp.uint32),
            jax.ShapeDtypeStruct((cap,), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.uint32),
        ],
        interpret=interpret,
    )(keys)


def _bench():  # pragma: no cover - manual on-chip experiment
    import time
    N, CAP = 1 << 16, 1 << 18
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 20, N).astype(np.uint32)
    x = jnp.asarray(keys)
    tk, tc, n = hash_insert(x, CAP)
    n0 = int(n[0])  # forces completion through the relay
    t0 = time.perf_counter()
    steps = 10
    acc = jnp.uint32(0)
    for _ in range(steps):
        acc = acc + hash_insert(x, CAP)[2][0]
    total = int(acc)
    dt = time.perf_counter() - t0
    assert total == steps * n0
    print("pallas scalar-probe insert: %.2f Mkeys/s (N=%d, cap=%d)"
          % (N * steps / dt / 1e6, N, CAP))


if __name__ == "__main__":  # pragma: no cover
    import os
    if os.environ.get("KMTPU_HASH_BENCH"):
        _bench()
