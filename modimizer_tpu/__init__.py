"""modimizer_tpu — a TPU-native modimizer framework (JAX/XLA/Pallas/pjit).

A from-scratch re-design of the capabilities of richarddurbin/modimizer
(reference mounted read-only at /root/reference) for TPU hardware:

- the rolling canonical k-mer hash + ``hash % d == 0`` modimizer filter runs as a
  vectorized XLA/Pallas scan over base-code batches (ops/seqhash.py),
- the modset k-mer dictionary is built with device-side compaction plus an exact
  host-side open-addressed-table replay (core/modset.py + native/), preserving the
  reference's first-encounter-order ids and on-disk ``MSHSTv2`` byte layout
  (reference: modset.c:45-104),
- multi-chip scaling shards the k-mer stream across a jax.sharding.Mesh with
  all_to_all routing by hash prefix and saturating-add merges (parallel/).

The CLI programs (cli/) mirror the reference's ordered-command surface
(modutils, modmap, modasm, composition, seqconvert, seqhoco, modrep, modtype).
"""

import jax

# The seqhash math is 64-bit (kmer * factor1 mod 2^64; reference seqhash.h:58).
# TPU emulates u64 on the VPU; enable x64 before any tracing happens.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
