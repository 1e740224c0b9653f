"""Interpret-mode correctness of the Pallas open-addressing insert
experiment (parallel/pallas_hash.py) against a numpy unique-count
oracle."""
import numpy as np

import jax.numpy as jnp

from kmernator_tpu.parallel.pallas_hash import hash_insert


def test_hash_insert_counts():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 500, 4096).astype(np.uint32)
    tk, tc, n = hash_insert(jnp.asarray(keys), cap=2048, interpret=True)
    tk, tc = np.asarray(tk), np.asarray(tc)
    want_k, want_c = np.unique(keys, return_counts=True)
    assert int(n[0]) == len(want_k)
    got = {int(k): int(c) for k, c in zip(tk, tc)
           if k != 0xFFFFFFFF}
    assert got == dict(zip(want_k.tolist(), want_c.tolist()))
