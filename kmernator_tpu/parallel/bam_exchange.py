"""Distributed BAM record redistribution over the device mesh.

The MPIReadExchanger analogue (ref: src/SamUtils.h:1266-1421): alignment
records are binned by position splitters and exchanged with ONE
jax.lax.all_to_all of padded byte buckets — the record bytes ride the
same collective fabric as the kmer routing, instead of MPI_Alltoallv.

Splitters are computed from an allgathered sample of sort keys, so every
process derives identical bins without a coordinator (the reference
gathers per-rank position histograms the same way).
"""
from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from kmernator_tpu.parallel.mesh import shard_map
from kmernator_tpu.parallel import multihost as mh


def sort_key(bd) -> np.ndarray:
    """samtools coordinate key (unmapped last) — must match
    io/bam.py coordinate_sort_order."""
    ref = np.where(bd.ref_id < 0, np.int64(1 << 40),
                   bd.ref_id.astype(np.int64))
    return ref * (1 << 34) + (bd.pos.astype(np.int64) + 2)


def global_splitters(keys: np.ndarray, n_bins: int,
                     sample_per_bin: int = 32) -> np.ndarray:
    """[n_bins-1] splitters from an allgathered key sample; identical on
    every process."""
    S = n_bins * sample_per_bin
    local = np.sort(keys.astype(np.int64))
    if len(local) == 0:
        sample = np.full(S, np.int64((1 << 62) - 1))
    else:
        qi = np.linspace(0, len(local) - 1, S).astype(np.int64)
        sample = local[qi]
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        gathered = np.asarray(
            multihost_utils.process_allgather(sample)).reshape(-1)
    else:
        gathered = sample
    gathered = np.sort(gathered)
    qi = (np.arange(1, n_bins) * len(gathered)) // n_bins
    return gathered[qi]


def exchange_blobs(blobs: List[bytes], mesh: Mesh) -> List[List[bytes]]:
    """blobs[d] = bytes this process sends to device d (all D devices).
    Returns, per LOCAL device, the list of D received blobs in source
    order.  One all_to_all of [D, C] u8 + one of lengths."""
    D = mesh.devices.size
    axis = mesh.axis_names[0]
    D_local = sum(1 for d in mesh.devices.flat
                  if d.process_index == jax.process_index())
    assert len(blobs) == D
    lens = np.array([len(b) for b in blobs], np.int32)
    C = int(mh.allreduce_max_int(int(lens.max()) if len(blobs) else 0))
    C = max(((C + 127) // 128) * 128, 128)
    send = np.zeros((D_local, D, C), np.uint8)
    send_lens = np.zeros((D_local, D), np.int32)
    # all outgoing data rides the process's first local device row; the
    # other local devices send empty buckets
    for d, b in enumerate(blobs):
        if b:
            send[0, d, :len(b)] = np.frombuffer(b, np.uint8)
    send_lens[0, :] = lens

    def step(x, ln):
        a2a = lambda v: jax.lax.all_to_all(v, axis, split_axis=0,
                                           concat_axis=0)
        return a2a(x.reshape(D, C)).reshape(1, D, C), \
            a2a(ln.reshape(D)).reshape(1, D)

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None)),
        out_specs=(P(axis, None, None), P(axis, None))))
    gx = mh.to_global(mesh, P(axis, None, None), send)
    gl = mh.to_global(mesh, P(axis, None), send_lens)
    rx, rl = fn(gx, gl)
    rx = mh.to_local(mesh, P(axis, None, None), rx)
    rl = mh.to_local(mesh, P(axis, None), rl)
    out = []
    for dd in range(D_local):
        out.append([rx[dd, s, :rl[dd, s]].tobytes() for s in range(D)])
    return out
