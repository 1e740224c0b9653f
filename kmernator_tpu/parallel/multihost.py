"""Multi-host runtime: process lifecycle + partitioned IO + gathered output.

Plays the role of ScopedMPIComm + DistributedOfstreamMap
(ref: src/MPIUtils.h:257-391, src/DistributedOfstreamMap.h:67-412) for
multi-host TPU pods: `jax.distributed.initialize` over DCN, a global mesh
spanning all hosts' devices, per-process byte-range input partitions with
pair-preserving resync, and rank-ordered output concatenation (rank 0
first — the reference's append ordering, apps/FilterReads-P.cpp:190-197).

Single-host sessions degrade gracefully (process_count == 1).
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def initialize(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """ref: ScopedMPIComm ctor.  No-op when running single-process."""
    import jax
    if num_processes is None:
        num_processes = int(os.environ.get("KMERNATOR_TPU_NPROCS", "1"))
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    os.environ["KMERNATOR_TPU_RANK"] = str(jax.process_index())
    return jax.process_index(), jax.process_count()


def global_mesh(axis: str = "d"):
    """Mesh over every device of every process (ICI within host, DCN across).
    shard_map collectives over this mesh ride the fastest links XLA can
    schedule — the reference's MPI_Alltoallv equivalent."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def my_partition(n_items: int) -> slice:
    import jax
    rank, size = jax.process_index(), jax.process_count()
    per = (n_items + size - 1) // size
    return slice(rank * per, min((rank + 1) * per, n_items))


def load_partitioned_reads(paths: List[str], fastq_base_quality: int = 33,
                           output_base_quality: int = 33,
                           comment_stored: bool = True):
    """Each process parses its byte range of every input file
    (ref: ReadSet::appendAllFiles(files, rank, size))."""
    import jax
    from kmernator_tpu.io.reads import load_reads
    rank, size = jax.process_index(), jax.process_count()
    return load_reads(paths, fastq_base_quality, output_base_quality,
                      comment_stored,
                      byte_range=(rank, size) if size > 1 else None)


def write_gathered(path: str, local_data: bytes):
    """Rank-ordered concatenated output: each process writes a rank temp
    file; process 0 concatenates in rank order (ref: DistributedOfstreamMap
    ::concatenateMPI + the rank0-overwrite-then-append ordering)."""
    import jax
    rank, size = jax.process_index(), jax.process_count()
    if size == 1:
        with open(path, "wb") as f:
            f.write(local_data)
        return
    part = "%s--part-%05d" % (path, rank)
    with open(part, "wb") as f:
        f.write(local_data)
    # all processes must finish writing before rank 0 concatenates
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("kmernator_write_gathered")
    if rank == 0:
        with open(path, "wb") as out:
            for r in range(size):
                p = "%s--part-%05d" % (path, r)
                with open(p, "rb") as f:
                    out.write(f.read())
                os.unlink(p)
    multihost_utils.sync_global_devices("kmernator_write_gathered_done")
