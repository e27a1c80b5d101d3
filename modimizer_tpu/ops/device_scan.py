"""Device (TPU/XLA) scan kernel, split out so host-path CLI runs never
import jax (which costs ~2 s on this host)."""

import functools

import modimizer_tpu

modimizer_tpu.configure_jax()

import jax
import jax.numpy as jnp

from .packed import (canonical_hashes, derive_tw, extract_kmers,
                     mod_is_zero)


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "factor1", "cap"))
def _scan_chunk(sw, m, *, k, w, factor1, cap):
    """Packed-stream scan of C positions (C = 32*(len(sw)-1)).

    Emitted rows are compacted by ONE unstable 3-column sort whose key embeds
    the stream position (emitted-first), so the compacted rows come out in
    exact stream order with no gathers (TPU gathers serialize; sorts move
    payload columns at memory speed).

    sw: u64 [C/32 + 1] (halo word).  m: i32 live-position count.
    Returns (kmers u64 [cap], meta u64 [cap] = (pos << 1) | isF, total i32).
    Rows beyond cap are dropped; total reports the true count so the caller
    can fall back to a host rescan.
    """
    C = 32 * (sw.shape[0] - 1)
    tw = derive_tw(sw)
    h, hrc = extract_kmers(sw, tw, k, C)
    hashes, kmers, isF = canonical_hashes(h, hrc, k, factor1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)[:, 0]
    emit = mod_is_zero(hashes, w) & (pos < m)
    khi = (kmers >> jnp.uint64(32)).astype(jnp.uint32)
    klo = (kmers & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    meta32 = ((pos.astype(jnp.uint32) << jnp.uint32(1))
              | isF.astype(jnp.uint32))
    keypos = jnp.where(emit, pos.astype(jnp.uint32),
                       pos.astype(jnp.uint32) | jnp.uint32(0x80000000))
    _sk, shi, slo, sm = jax.lax.sort((keypos, khi, klo, meta32), num_keys=1,
                                     is_stable=False)
    total = jnp.sum(emit).astype(jnp.int32)
    out_k = ((shi[:cap].astype(jnp.uint64) << jnp.uint64(32))
             | slo[:cap].astype(jnp.uint64))
    out_m = sm[:cap].astype(jnp.uint64)
    return out_k, out_m, total


