"""Device (TPU/XLA) scan kernel, split out so host-path CLI runs never
import jax (which costs ~2 s on this host).

Per-chunk pipeline (re-design of the reference's sequential rolling
iterator, seqhash.c:154-196): phase-major funnel scan + per-block MXU
compaction (parallel/sharded.py _scan_compact_core).  The compacted rows
come back sentinel-padded in block-major order and the *host* restores
exact stream order with one cheap sort by (pos << 1 | isF) — a deliberate
split: a device-side lax.sort would be semantically identical but costs
minutes of XLA compile time on this backend, while the host sort of ~C/w
rows is tens of milliseconds.  Device->host traffic stays proportional to
matches (~C/w of positions), not positions."""

import functools

import modimizer_tpu

modimizer_tpu.configure_jax()

import jax
import jax.numpy as jnp

from ..parallel.sharded import BLK, _scan_compact_core
from .seqhash import BLK_COMPACT, scan_bo  # noqa: F401  (re-export)

assert BLK_COMPACT == BLK  # keep the jax-free mirror honest


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "factor1", "bo"))
def _scan_chunk(sw, m, *, k, w, factor1, bo):
    """Packed-stream scan of C positions (C = 32*(len(sw)-2)).

    sw: u64 [C/32 + 2] (big-endian-packed words + halo).  m: i32 live-
    position count.  Returns (kmers [C/BLK*bo] sentinel-padded block-major,
    meta u32 [C/BLK*bo] = (pos << 1) | isF with 0xFFFFFFFF sentinels,
    total i32).  total < 0 signals a block overflow (some rows dropped):
    the caller re-runs with a wider bo or falls back to a host rescan."""
    C = 32 * (sw.shape[0] - 2)
    NW = C // 32
    rows = jax.lax.broadcasted_iota(jnp.uint32, (32, NW), 0)
    pos = (jax.lax.broadcasted_iota(jnp.uint32, (32, NW), 1) * jnp.uint32(32)
           + rows)
    valid = pos < jnp.uint32(m)
    out_k, out_meta, n_emit, overflow = _scan_compact_core(
        sw, valid, k=k, w=w, factor1=factor1, C=C, bo=bo, meta_isf=True)
    total = jnp.where(overflow, jnp.int32(-1), n_emit.astype(jnp.int32))
    if k <= 16:  # kmer fits u32: halve the device->host bytes
        return out_k.astype(jnp.uint32), out_meta, total
    return out_k, out_meta, total
