"""kmernator_tpu: a TPU-native k-mer spectrum engine.

A ground-up re-design of the capabilities of Kmernator (an MPI+OpenMP C++
toolkit for large-scale k-mer analysis of sequencing reads) for TPU
hardware: reads are packed into dense integer tensors, canonical k-mers are
extracted with vectorized shift/mask windows, and the distributed k-mer
spectrum is a hash-sharded table across a `jax.sharding.Mesh`, with batch
k-mers routed to owner shards via `all_to_all` and merged with sort/segment
ops (replacing the reference's MPIBuffer/DistributedFunctions layer).

Layer map (mirrors reference layering, see SURVEY.md):
  utils/   L1: config, logging                   (ref: src/Options.h, src/Log.h)
  io/      L2: FASTQ/FASTA IO + packed batches   (ref: src/ReadFileReader.h, src/ReadSet.h, src/Sequence.h)
  ops/     L3: codec, kmer windows, weights      (ref: src/TwoBitSequence.h, src/Kmer.h, src/KmerReadUtils.h)
  parallel/L4+L5: mesh, sharded spectrum         (ref: src/MPIBuffer.h, src/KmerSpectrum.h, src/DistributedFunctions.h)
  ops/trim, ops/artifact  L6: selection          (ref: src/ReadSelector.h, src/FilterKnownOddities.h)
  apps/    L7: CLI applications                  (ref: apps/*.cpp)
"""

__version__ = "0.1.0"
