"""Pallas run-length count kernel vs numpy oracle (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from kmernator_tpu.parallel.pallas_count import (run_length_counts,
                                                 run_length_counts_reference)


def _case(hi, lo, good, block_rows=8):
    got = np.asarray(run_length_counts(jnp.asarray(hi), jnp.asarray(lo),
                                       jnp.asarray(good),
                                       block_rows=block_rows, interpret=True))
    want = run_length_counts_reference(hi, lo, good)
    assert np.array_equal(got, want)


def test_random_runs():
    rng = np.random.default_rng(0)
    N = 4 * 8 * 128
    vals = np.sort(rng.integers(0, 300, N))
    hi = (vals // 7).astype(np.uint32)
    lo = (vals % 7).astype(np.uint32)
    order = np.lexsort((lo, hi))
    _case(hi[order], lo[order], rng.random(N) < 0.7)


def test_high_bit_keys_and_cross_block_runs():
    N = 2 * 8 * 128
    # one giant run with the sign bit set, spanning both blocks
    hi = np.full(N, 0xDEADBEEF, np.uint32)
    lo = np.full(N, 0xFFFFFFF0, np.uint32)
    good = np.ones(N, bool)
    good[::3] = False
    _case(hi, lo, good)
    # run boundary exactly at the block boundary
    hi2 = hi.copy()
    hi2[N // 2:] = 0xDEADBEF0
    _case(hi2, lo, good)


def test_all_unique():
    N = 8 * 128
    hi = np.arange(N, dtype=np.uint32)
    lo = np.zeros(N, np.uint32)
    _case(hi, lo, np.ones(N, bool))
    got = np.asarray(run_length_counts(jnp.asarray(hi), jnp.asarray(lo),
                                       jnp.asarray(np.ones(N, bool)),
                                       block_rows=8, interpret=True))
    assert (got == 1).all()
