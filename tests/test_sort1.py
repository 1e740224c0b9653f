"""KMTPU_SORT1 (1-key sort + odd-even equal-hi cleanup) must equal the
2-key lax.sort exactly, including under adversarial hi-word collisions."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kmernator_tpu.parallel.device_spectrum import (_sort2_via_1key,
                                                    count_batch)


def test_sort1_adversarial_collisions():
    rng = np.random.default_rng(0)
    N = 1 << 14
    hi = rng.integers(0, 40, N).astype(np.uint32)   # dense collisions
    lo = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
    got = [np.asarray(x) for x in
           _sort2_via_1key(jnp.asarray(hi), jnp.asarray(lo))]
    ref = jax.lax.sort([jnp.asarray(hi), jnp.asarray(lo)], num_keys=2,
                       is_stable=False)
    assert np.array_equal(got[0], np.asarray(ref[0]))
    assert np.array_equal(got[1], np.asarray(ref[1]))


def test_count_batch_sort1_parity(monkeypatch):
    rng = np.random.default_rng(7)
    N = 1 << 15
    hi = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
    good = rng.random(N) < 0.9
    cols = [jnp.asarray(hi), jnp.asarray(lo)]
    k0, c0, n0 = count_batch(cols, jnp.asarray(good), 1)
    monkeypatch.setenv("KMTPU_SORT1", "1")
    count_batch._clear_cache()
    try:
        k1, c1, n1 = count_batch(cols, jnp.asarray(good), 1)
    finally:
        monkeypatch.delenv("KMTPU_SORT1")
        count_batch._clear_cache()
    assert int(n0) == int(n1)
    assert np.array_equal(np.asarray(k0), np.asarray(k1))
    assert np.array_equal(np.asarray(c0), np.asarray(c1))
