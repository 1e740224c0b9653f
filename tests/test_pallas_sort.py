"""Merge-path pallas sort == lax.sort (interpret mode, CPU): duplicates,
sentinels, odd run counts, non-multiple N."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kmernator_tpu.parallel.pallas_sort import merge_sort_2key


@pytest.mark.parametrize("N,block,chunk", [
    (1 << 14, 4096, 1024),       # power-of-two blocks
    (4096 * 7, 4096, 1024),      # odd run count at several levels
    (4096 * 7 - 1000, 4096, 1024),  # N not a block multiple (sentinel pad)
    (70 * 2048, 2048, 1024),     # the bench's 70-block shape, scaled down
])
def test_merge_sort_matches_lax_sort(N, block, chunk):
    rng = np.random.default_rng(2)
    hi = rng.integers(0, 30, N).astype(np.uint32)   # heavy duplicates
    lo = rng.integers(0, 3, N).astype(np.uint32)
    m = rng.random(N) < 0.05
    hi[m] = 0xFFFFFFFF
    lo[m] = 0xFFFFFFFF
    h, l = merge_sort_2key(jnp.asarray(hi), jnp.asarray(lo),
                           block=block, chunk=chunk, interpret=True)
    key = np.sort((hi.astype(np.uint64) << 32) | lo)
    got = (np.asarray(h).astype(np.uint64) << 32) | np.asarray(l)
    assert np.array_equal(got, key)


def test_merge_sort_random_wide_keys():
    rng = np.random.default_rng(7)
    N = 30000
    hi = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
    h, l = merge_sort_2key(jnp.asarray(hi), jnp.asarray(lo),
                           block=4096, chunk=1024, interpret=True)
    key = np.sort((hi.astype(np.uint64) << 32) | lo)
    got = (np.asarray(h).astype(np.uint64) << 32) | np.asarray(l)
    assert np.array_equal(got, key)
