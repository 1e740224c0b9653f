"""Merge-path 2-word-key sort: Pallas in-VMEM bitonic block sorts + a
Pallas bitonic merge kernel.

XLA's TPU sort is a blocked bitonic network whose cross-block stages each
re-touch ALL data in HBM (~28 passes at 9.2M rows — measured 26.3 ms
unstable); a mergesort only needs ceil(log2(blocks)) single-pass merge
levels.  Phase 1 bitonic-sorts each block entirely in VMEM (XLA's own
batched sort measured 60 ms at ANY [R, C] split of 9.2M rows — no use);
phase 2 merges pairs of sorted runs per level, one HBM pass per level:

  - the merge-path split (Green et al.'s GPU Merge Path, here in plain
    XLA) finds, for every output chunk boundary d, the unique (a, b) with
    a + b = d such that A[:a] and B[:b] are exactly the first d merged
    elements (ties break A-first);
  - each grid step DMAs fixed-size A/B windows at those offsets into
    VMEM, masks the beyond-split tails to the sentinel, and runs a
    bitonic MERGE (reverse B, concat, log2(2*chunk) compare-exchange
    stages; lane-crossing strides via pltpu.roll) — the first `chunk`
    outputs are the step's slice of the merged pair.

Keys are (hi, lo) u32 pairs compared lexicographically — the spectrum's
canonical-kmer word columns (ref: the sorted-table counting design,
src/KmerSpectrum.h:1578-1668 replaced by sort/scan).  All-ones is the
existing sentinel (masked windows) and sorts last, padding included.

Used by count_batch when KMTPU_MERGE_SORT=1 and the shape qualifies
(verified identical to lax.sort counting on-chip); OFF by default — the
full sort measured 34.6 ms vs lax.sort's 26.3 ms at the 9.2M-row bench
shape (the merge levels hit the one-pass design goal, but the VPU cost of
2-word bitonic compare-exchange in phase 1 dominates).  Kept as the
scaffold for a fused local-sort+first-merge kernel.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------
# lexicographic (hi, lo) compare helpers
# ---------------------------------------------------------------------

def _le(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al <= bl))


# ---------------------------------------------------------------------
# merge-path split search (plain XLA, tiny arrays)
# ---------------------------------------------------------------------

def _merge_path_splits_desc(hi, lo, a0, alen, b0, blen, dloc, maxlen):
    """Merge-path A-side split per output chunk, for arbitrary run pairs.

    a0/alen/b0/blen/dloc: [C] int32 per output chunk — the pair's A and B
    runs and the chunk's local boundary d within the merged pair.
    Returns a [C] int32: elements of A preceding the boundary (ties
    A-first).
    """
    N = hi.shape[0]
    lo_s = jnp.maximum(0, dloc - blen).astype(jnp.int32)
    hi_s = jnp.minimum(dloc, alen).astype(jnp.int32)

    def body(_, state):
        lo_c, hi_c = state
        a = (lo_c + hi_c) // 2
        b = dloc - a
        ai = jnp.clip(a0 + a, 0, N - 1)
        bi = jnp.clip(b0 + b - 1, 0, N - 1)
        # advance a while A[a] <= B[b-1] (A wins ties); b == 0 forces
        # advance (nothing taken from B yet), a == hi forces stop
        adv = _le(hi[ai], lo[ai], hi[bi], lo[bi]) | (b - 1 < 0)
        adv = adv & (a < hi_c)
        lo_c = jnp.where(adv, a + 1, lo_c)
        hi_c = jnp.where(adv, hi_c, a)
        return lo_c, hi_c

    steps = int(np.ceil(np.log2(max(maxlen, 2)))) + 2
    lo_s, hi_s = jax.lax.fori_loop(0, steps, body, (lo_s, hi_s))
    return lo_s.astype(jnp.int32)


# ---------------------------------------------------------------------
# bitonic merge of two sorted VMEM chunks (jnp ops usable in/out of pallas)
# ---------------------------------------------------------------------

def _bitonic_merge_rows(h, l, rows: int, lanes: int):
    """In-register bitonic merge of a bitonic [rows*lanes] sequence laid
    out row-major as [rows, lanes].  Returns sorted (h, l)."""
    n = rows * lanes
    stages = int(np.log2(n))
    assert 1 << stages == n
    lin = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0) * lanes + \
        jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    for s in range(stages - 1, -1, -1):
        stride = 1 << s
        is_top = (lin & stride) == 0
        if stride >= lanes:
            # partner rows r ^ (stride/lanes): two static row rolls + mask
            # (stays 2D — Mosaic rejects the 3D reshape/concat formulation)
            rs = stride // lanes
            ph = jnp.where(is_top, jnp.roll(h, -rs, axis=0),
                           jnp.roll(h, rs, axis=0))
            pl_ = jnp.where(is_top, jnp.roll(l, -rs, axis=0),
                            jnp.roll(l, rs, axis=0))
        else:
            # lane-crossing stage: partner = lane ^ stride
            ph = _roll_lanes(h, stride, is_top)
            pl_ = _roll_lanes(l, stride, is_top)
        keep_small = _le(h, l, ph, pl_)
        # top keeps min, bottom keeps max.  XNOR form (Mosaic cannot lower
        # select_n on i1 vectors); ties need no special case — the partner
        # holds the identical value, so either choice writes the same bits
        take_self = ~(is_top ^ keep_small)
        h = jnp.where(take_self, h, ph)
        l = jnp.where(take_self, l, pl_)
    return h, l


def _roll_lanes(x, stride, is_top):
    """Partner values for lane-XOR pairing: lane ^ stride."""
    fwd = jnp.roll(x, -stride, axis=1)
    bwd = jnp.roll(x, stride, axis=1)
    return jnp.where(is_top, fwd, bwd)


# ---------------------------------------------------------------------
# the pallas merge level (arbitrary run structure, chunk-aligned runs)
# ---------------------------------------------------------------------

def _rot_left_flat(h, l, shift, rows: int, lanes: int):
    """Rotate a [rows, lanes] row-major flat sequence left by a dynamic
    shift in [0, lanes), using static bit-unrolled rotations (Mosaic has
    no dynamic lane shuffle)."""
    shift_v = jnp.full((rows, lanes), shift, jnp.int32)
    b = 1
    while b < lanes:
        rh = jnp.concatenate([h[:, b:], jnp.roll(h, -1, axis=0)[:, :b]],
                             axis=1)
        rl = jnp.concatenate([l[:, b:], jnp.roll(l, -1, axis=0)[:, :b]],
                             axis=1)
        take = (shift_v & b) != 0  # vector mask: Mosaic dislikes scalar i1
        h = jnp.where(take, rh, h)
        l = jnp.where(take, rl, l)
        b *= 2
    return h, l


def _xor_reverse(x, size: int, axis: int):
    """Reverse along `axis` (length a power of two) as a cascade of
    XOR-stride swaps — Mosaic has no `rev` lowering, but static rolls
    compose: index ^ (size-1) = product of index ^ 2^k swaps."""
    shape = x.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    b = 1
    while b < size:
        is_top = (idx & b) == 0
        x = jnp.where(is_top, jnp.roll(x, -b, axis=axis),
                      jnp.roll(x, b, axis=axis))
        b *= 2
    return x


def _reverse_flat(x, rows: int, lanes: int):
    """Reverse a [rows, lanes] row-major flat sequence."""
    return _xor_reverse(_xor_reverse(x, rows, 0), lanes, 1)


def _pair_runs(runs):
    """[(off, len)...] -> (pairs [(a0, alen, b0, blen)...], next_runs).
    Odd tail run passes through as a (run, empty) pair (a plain copy)."""
    pairs = []
    nxt = []
    i = 0
    while i < len(runs):
        a0, alen = runs[i]
        if i + 1 < len(runs):
            b0, blen = runs[i + 1]
        else:
            b0, blen = a0 + alen, 0
        pairs.append((a0, alen, b0, blen))
        nxt.append((a0, alen + blen))
        i += 2
    return pairs, nxt


def _chunk_descriptors(pairs, chunk: int):
    """Static per-output-chunk descriptor arrays for one merge level."""
    a0, alen, b0, blen, dloc = [], [], [], [], []
    for (pa, la, pb, lb) in pairs:
        cpp = (la + lb) // chunk
        for c in range(cpp):
            a0.append(pa)
            alen.append(la)
            b0.append(pb)
            blen.append(lb)
            dloc.append(c * chunk)
    f = lambda v: np.asarray(v, np.int32)
    return f(a0), f(alen), f(b0), f(blen), f(dloc)


def merge_level(hi, lo, runs, chunk: int, interpret: bool = False):
    """One merge level: adjacent run pairs merge, odd tail copies through.
    All run lengths and N are multiples of `chunk` (a power of two >= 256).
    Returns (hi, lo, next_runs)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = hi.shape[0]
    lanes = 128
    crows = chunk // lanes
    assert chunk >= 1024 and chunk & (chunk - 1) == 0, chunk
    # window rows must stay a multiple of 8 (u32 sublane tile) — an odd
    # row count in the DMA destination crashes the TPU worker
    win_rows = crows + 8
    pairs, next_runs = _pair_runs(runs)
    a0d, alend, b0d, blend, dlocd = _chunk_descriptors(pairs, chunk)
    grid = len(a0d)
    assert grid * chunk == N, (grid, chunk, N)
    maxlen = max(r[1] for r in runs)
    a_split = _merge_path_splits_desc(
        hi, lo, jnp.asarray(a0d), jnp.asarray(alend), jnp.asarray(b0d),
        jnp.asarray(blend), jnp.asarray(dlocd), maxlen)
    # next chunk boundary's split (or the pair end) bounds this chunk's A
    is_last = np.zeros(grid, bool)
    for i in range(grid):
        is_last[i] = (i + 1 == grid) or (a0d[i + 1] != a0d[i]) \
            or (dlocd[i + 1] == 0)
    nxt_split = jnp.concatenate([a_split[1:], a_split[:1]])
    a_hi = jnp.where(jnp.asarray(is_last), jnp.asarray(alend), nxt_split)
    a_off = jnp.asarray(a0d) + a_split
    a_len = a_hi - a_split
    b_off = jnp.asarray(b0d) + (jnp.asarray(dlocd) - a_split)
    b_hi_loc = jnp.where(jnp.asarray(is_last), jnp.asarray(blend),
                         jnp.asarray(dlocd) + chunk - nxt_split)
    b_len = b_hi_loc - (jnp.asarray(dlocd) - a_split)

    SENT = np.uint32(0xFFFFFFFF)
    pad = (win_rows + 1) * lanes
    hp = jnp.concatenate([hi, jnp.full(pad, SENT, jnp.uint32)])
    lp = jnp.concatenate([lo, jnp.full(pad, SENT, jnp.uint32)])
    total_rows = (N + pad) // lanes

    def kernel(aoff_ref, alen_ref, boff_ref, blen_ref,
               h_hbm, l_hbm, oh_ref, ol_ref, vh, vl, sem):
        step = pl.program_id(0)
        ao = aoff_ref[step]
        al = alen_ref[step]
        bo = boff_ref[step]
        bl = blen_ref[step]
        a_row = ao // lanes
        b_row = bo // lanes
        copies = [
            pltpu.make_async_copy(h_hbm.at[pl.ds(a_row, win_rows)],
                                  vh.at[0], sem.at[0]),
            pltpu.make_async_copy(l_hbm.at[pl.ds(a_row, win_rows)],
                                  vl.at[0], sem.at[1]),
            pltpu.make_async_copy(h_hbm.at[pl.ds(b_row, win_rows)],
                                  vh.at[2], sem.at[2]),
            pltpu.make_async_copy(l_hbm.at[pl.ds(b_row, win_rows)],
                                  vl.at[2], sem.at[3]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        a_shift = ao - a_row * lanes
        b_shift = bo - b_row * lanes
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (crows, lanes), 0) * lanes + \
            jax.lax.broadcasted_iota(jnp.int32, (crows, lanes), 1)
        # rotate so the window's valid run starts at linear position 0;
        # the valid run is <= chunk elements, so the extra row drops off
        ah, al_ = _rot_left_flat(vh[0], vl[0], a_shift, win_rows, lanes)
        bh, bl_ = _rot_left_flat(vh[2], vl[2], b_shift, win_rows, lanes)
        ah, al_ = ah[:crows], al_[:crows]
        bh, bl_ = bh[:crows], bl_[:crows]
        ah = jnp.where(idx < al, ah, SENT)
        al_ = jnp.where(idx < al, al_, SENT)
        bh = jnp.where(idx < bl, bh, SENT)
        bl_ = jnp.where(idx < bl, bl_, SENT)
        # reverse B, concat -> bitonic sequence; SENT tails sort last
        bh = _reverse_flat(bh, crows, lanes)
        bl_ = _reverse_flat(bl_, crows, lanes)
        h = jnp.concatenate([ah, bh], axis=0)
        l = jnp.concatenate([al_, bl_], axis=0)
        h, l = _bitonic_merge_rows(h, l, 2 * crows, lanes)
        oh_ref[...] = h[:crows]
        ol_ref[...] = l[:crows]

    out_shape = (
        jax.ShapeDtypeStruct((grid * crows, lanes), jnp.uint32),
        jax.ShapeDtypeStruct((grid * crows, lanes), jnp.uint32),
    )
    oh, ol = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec((crows, lanes), lambda i, *_: (i, 0)),
                pl.BlockSpec((crows, lanes), lambda i, *_: (i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((3, win_rows, lanes), jnp.uint32),
                pltpu.VMEM((3, win_rows, lanes), jnp.uint32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(a_off.astype(jnp.int32), a_len.astype(jnp.int32),
      b_off.astype(jnp.int32), b_len.astype(jnp.int32),
      hp.reshape(total_rows, lanes), lp.reshape(total_rows, lanes))
    return oh.reshape(N), ol.reshape(N), next_runs


# ---------------------------------------------------------------------
# pallas local block sort (phase 1)
# ---------------------------------------------------------------------

def _bitonic_sort_rows(h, l, rows: int, lanes: int):
    """Full ascending bitonic sort of a [rows*lanes] row-major sequence."""
    n = rows * lanes
    stages = int(np.log2(n))
    assert 1 << stages == n
    lin = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0) * lanes + \
        jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    for p in range(1, stages + 1):
        # ascending segment iff bit p of the linear index is 0 (the last
        # phase is one big ascending merge)
        asc = (lin & (1 << p)) == 0 if p < stages else \
            jnp.ones((rows, lanes), jnp.bool_)
        for s in range(p - 1, -1, -1):
            stride = 1 << s
            is_top = (lin & stride) == 0
            if stride >= lanes:
                rs = stride // lanes
                ph = jnp.roll(h, -rs, axis=0)
                pl_ = jnp.roll(l, -rs, axis=0)
                qh = jnp.roll(h, rs, axis=0)
                ql = jnp.roll(l, rs, axis=0)
                ph = jnp.where(is_top, ph, qh)
                pl_ = jnp.where(is_top, pl_, ql)
            else:
                ph = _roll_lanes(h, stride, is_top)
                pl_ = _roll_lanes(l, stride, is_top)
            self_small = _le(h, l, ph, pl_)
            keep = is_top ^ asc ^ self_small  # = (is_top==asc)? small : ~small
            h = jnp.where(keep, h, ph)
            l = jnp.where(keep, l, pl_)
    return h, l


def local_sort_blocks(hi, lo, block: int, interpret: bool = False):
    """Sort each [block] slice of (hi, lo) independently (pallas kernel,
    one grid step per block; block a power of two, N % block == 0)."""
    from jax.experimental import pallas as pl

    N = hi.shape[0]
    lanes = 128
    rows = block // lanes
    grid = N // block

    def kernel(h_ref, l_ref, oh_ref, ol_ref):
        h, l = _bitonic_sort_rows(h_ref[...], l_ref[...], rows, lanes)
        oh_ref[...] = h
        ol_ref[...] = l

    oh, ol = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, lanes), lambda i: (i, 0)),
            pl.BlockSpec((rows, lanes), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rows, lanes), lambda i: (i, 0)),
            pl.BlockSpec((rows, lanes), lambda i: (i, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((N // lanes, lanes), jnp.uint32),
            jax.ShapeDtypeStruct((N // lanes, lanes), jnp.uint32),
        ),
        interpret=interpret,
    )(hi.reshape(N // lanes, lanes), lo.reshape(N // lanes, lanes))
    return oh.reshape(N), ol.reshape(N)


def merge_sort_2key(hi, lo, block: int = 1 << 17, chunk: int = 1 << 15,
                    interpret: bool = False):
    """Full unstable sort of (hi, lo) u32 key columns.

    Pads N up to a multiple of `block` with the sentinel (callers slice
    [:N] back; sentinel rows sort last so a padded sort of padded data is
    a sorted prefix).  block and chunk are powers of two, chunk | block.
    """
    N = hi.shape[0]
    SENT = np.uint32(0xFFFFFFFF)
    Np = -(-N // block) * block
    if Np != N:
        padn = Np - N
        hi = jnp.concatenate([hi, jnp.full(padn, SENT, jnp.uint32)])
        lo = jnp.concatenate([lo, jnp.full(padn, SENT, jnp.uint32)])
    h, l = local_sort_blocks(hi, lo, block, interpret=interpret)
    runs = [(i * block, block) for i in range(Np // block)]
    while len(runs) > 1:
        h, l, runs = merge_level(h, l, runs, chunk, interpret=interpret)
    return h[:N], l[:N]
