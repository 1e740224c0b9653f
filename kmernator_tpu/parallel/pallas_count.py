"""Pallas TPU kernel: single-pass run-length counting over sorted keys.

After the XLA sort, the pure-XLA count path (_run_counts_scan) makes four
full passes over HBM (cumsum, two cross-block scans, elementwise).  This
kernel fuses them into ONE pass: the TPU grid executes sequentially, so an
SMEM scratch carries (previous key, running good-count of the unfinished
run) across blocks; each block computes its segmented sums entirely in VMEM
(log-step Hillis-Steele scans — Mosaic has no cumsum primitive) and emits
run totals at run-END positions.

Output convention: counts[i] > 0 exactly at the last element of each key
run; unlike _run_counts_scan the count is NOT broadcast to every element —
spectrum building doesn't need that.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SENTINEL = np.uint32(0xFFFFFFFF)
_NEG_BIG = np.int32(-2147483647)


def _roll(x, shift, axis):
    """Circular shift that works both compiled (pltpu.roll) and interpreted."""
    return pltpu.roll(x, shift, axis)


def _lane_scan(x, op, fill):
    """Inclusive scan along axis 1 (128 lanes), log-step."""
    R, L = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    s = 1
    while s < L:
        shifted = _roll(x, s, 1)
        shifted = jnp.where(lane >= s, shifted, fill)
        x = op(x, shifted)
        s *= 2
    return x


def _row_scan(x, op, fill):
    """Inclusive scan along axis 0 (rows), log-step; x: [R, L]."""
    R, L = x.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    s = 1
    while s < R:
        shifted = _roll(x, s, 0)
        shifted = jnp.where(row >= s, shifted, fill)
        x = op(x, shifted)
        s *= 2
    return x


def _cumsum_rowmajor(g):
    """Row-major (flattened) inclusive cumsum of an [R, 128] i32 block."""
    row_c = _lane_scan(g, jnp.add, jnp.int32(0))
    row_tot = row_c[:, LANES - 1:LANES]  # [R, 1]
    tot_scan = _row_scan(jnp.broadcast_to(row_tot, row_c.shape), jnp.add,
                         jnp.int32(0))
    # exclusive row offset = inclusive scan of totals minus own total
    row_off = tot_scan[:, LANES - 1:LANES] - row_tot
    return row_c + row_off


def _cummax_rowmajor(x):
    row_m = _lane_scan(x, jnp.maximum, _NEG_BIG)
    row_tot = row_m[:, LANES - 1:LANES]
    tot_scan = _row_scan(jnp.broadcast_to(row_tot, row_m.shape), jnp.maximum,
                         _NEG_BIG)
    prior = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) >= 1,
        _roll(tot_scan[:, LANES - 1:LANES] * jnp.ones_like(x), 1, 0), _NEG_BIG)
    # prior[r] = max over rows < r
    return jnp.maximum(row_m, prior)


def _shift_right_1(x, first_fill):
    """Row-major shift right by one; element 0 gets first_fill."""
    R, L = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    r1 = _roll(x, 1, 1)                       # r1[:, 0] = x[:, L-1] (same row)
    prev_row = _roll(x, 1, 0)                 # row i <- row i-1
    prev_last = _roll(prev_row, 1, 1)         # [:, 0] = prev row's last lane
    out = jnp.where(lane == 0, prev_last, r1)
    out = jnp.where((lane == 0) & (row == 0), first_fill, out)
    return out


def _shift_left_1(x, last_fill):
    R, L = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    l1 = _roll(x, L - 1, 1)                   # l1[:, L-1] = x[:, 0] (same row)
    next_row = _roll(x, R - 1, 0)             # row i <- row i+1
    next_first = _roll(next_row, L - 1, 1)    # [:, L-1] = next row's first
    out = jnp.where(lane == L - 1, next_first, l1)
    out = jnp.where((lane == L - 1) & (row == R - 1), last_fill, out)
    return out


def _last_scalar(x):
    """x[R-1, LANES-1] without vector extract: masked reduction."""
    R, L = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    mask = (lane == L - 1) & (row == R - 1)
    return jnp.sum(jnp.where(mask, x, jnp.zeros_like(x)))


def _kernel(hi_ref, lo_ref, good_ref, nxt_ref, out_ref, carry_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[0] = jnp.uint32(int(SENTINEL) ^ 1)  # != any first key
        carry_ref[1] = jnp.uint32(0)
        carry_ref[2] = jnp.uint32(0)  # carried good-count

    hi = hi_ref[...]
    lo = lo_ref[...]
    g = good_ref[...]
    R = hi.shape[0]

    gcum = _cumsum_rowmajor(g)
    gexcl = gcum - g

    p_hi = _shift_right_1(hi, carry_ref[0])
    p_lo = _shift_right_1(lo, carry_ref[1])
    boundary = (hi != p_hi) | (lo != p_lo)

    marked = jnp.where(boundary, gexcl, jnp.int32(-1))
    base = _cummax_rowmajor(marked)
    pre_first = base < 0
    carry_cnt = carry_ref[2].astype(jnp.int32)
    cnt = gcum - jnp.where(pre_first, 0, base) + jnp.where(pre_first, carry_cnt, 0)

    n_hi = _shift_left_1(hi, nxt_ref[i, 0])
    n_lo = _shift_left_1(lo, nxt_ref[i, 1])
    is_end = (hi != n_hi) | (lo != n_lo)
    out_ref[...] = jnp.where(is_end, cnt, 0)

    last_cnt = _last_scalar(cnt)
    last_end = _last_scalar(is_end.astype(jnp.int32)) > 0
    carry_ref[0] = _last_scalar(hi.astype(jnp.int32)).astype(jnp.uint32)
    carry_ref[1] = _last_scalar(lo.astype(jnp.int32)).astype(jnp.uint32)
    carry_ref[2] = jnp.where(last_end, 0, last_cnt).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def run_length_counts(hi: jax.Array, lo: jax.Array, good: jax.Array,
                      block_rows: int = 512, interpret: bool = False):
    """counts-at-run-end for row-major sorted (hi, lo) key pairs.

    hi/lo: [N] uint32 sorted lexicographically (hi major); good: [N] bool.
    N must be a multiple of block_rows*128 (pad with sentinel keys).
    """
    N = hi.shape[0]
    BLK = block_rows * LANES
    assert N % BLK == 0, "pad N to a block multiple"
    nblocks = N // BLK
    hi2 = hi.reshape(nblocks * block_rows, LANES)
    lo2 = lo.reshape(nblocks * block_rows, LANES)
    g2 = good.reshape(nblocks * block_rows, LANES).astype(jnp.int32)
    firsts_hi = jnp.concatenate([hi2[block_rows::block_rows, 0],
                                 jnp.array([SENTINEL], jnp.uint32)])
    firsts_lo = jnp.concatenate([lo2[block_rows::block_rows, 0],
                                 jnp.array([SENTINEL], jnp.uint32)])
    nxt = jnp.stack([firsts_hi, firsts_lo], axis=1)  # [nblocks, 2]

    out = pl.pallas_call(
        _kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole [nblocks, 2]
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * block_rows, LANES),
                                       jnp.int32),
        scratch_shapes=[pltpu.SMEM((3,), jnp.uint32)],
        interpret=interpret,
    )(hi2, lo2, g2, nxt)
    return out.reshape(N)


def run_length_counts_reference(hi, lo, good):
    """numpy oracle for tests."""
    N = len(hi)
    counts = np.zeros(N, np.int32)
    i = 0
    while i < N:
        j = i
        tot = 0
        while j < N and hi[j] == hi[i] and lo[j] == lo[i]:
            tot += int(good[j])
            j += 1
        counts[j - 1] = tot
        i = j
    return counts
