"""Pallas TPU kernel: fused modimizer scan + MXU compaction (k <= 16).

The XLA formulation of the scan materializes every intermediate stream
(h/hRC/hashes/kmers/limbs) in HBM — ~20 ms per 16M positions on v5e.  This
kernel keeps everything for a 32K-position tile in VMEM/registers and fuses:

  - 2-bit extraction in a mosaic-friendly layout: positions live as
    (block, lane) = (64, 512) tiles; each block row carries its 33 packed
    words (16 bases each, one halo word, prepared host-side) which are
    broadcast to lanes with ``pltpu.repeat`` and funnel-shifted by the
    lane-dependent phase — no gathers, no cross-layout reshapes,
  - reverse-complement via in-register 2-bit-group reversal — for k <= 16
    the canonical k-mer fits 32 bits, so both strands and the hash are
    exact in u32 arithmetic: hash = hi32(kmer * factor1) >> (32 - 2k)
    (seqhash.h:58), with the 64-bit multiply done as 16-bit mul splits,
  - the `% d` filter and read-validity bits,
  - per-512-block compaction as two MXU matmuls: an upper-triangular-ones
    matmul is the in-block cumsum, and a one-hot matmul moves the 8-bit
    limbs of (kmer, position) exactly (TPU has no vector scatter, so
    compaction is dense algebra).

Output: per block, 9 f32 rows of width bo — 8 limb rows for the compacted
(kmer32, pos32) plus one count row.  In-block emission order is phase-major
(not stream order); positions are explicit, and every consumer orders by
position, so this changes nothing downstream.

Status: bit-exact on v5e hardware (verified against the sequential oracle),
but currently slower than the fused-XLA formulation in parallel/sharded.py
(~186 vs ~786 Mpos/s at 16M positions): mosaic keeps the u32 funnel math on
the VPU with narrow (32-deep) MXU contractions for the repeat-broadcasts.
Known optimization path: batch the per-tile matmuls to 128-deep
contractions and move the funnel to bf16 pair arithmetic.  The XLA path
stays the default; this kernel is the scaffold for that work.
"""

import functools
import sys as _sys

_sys.setrecursionlimit(max(_sys.getrecursionlimit(), 20000))

import modimizer_tpu

modimizer_tpu.configure_jax()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512      # positions per block (= lane dim of the work layout)
TBLK = 64      # blocks per grid tile
TILE = TBLK * BLK          # 32768 positions per tile
WPB = BLK // 16            # packed words per block (32) + 1 halo word


def pack_sw32(codes: np.ndarray, n_words: int) -> np.ndarray:
    """Host: 16 bases per u32 word, big-endian 2-bit groups."""
    n = len(codes)
    c = np.zeros(n_words * 16, np.uint8)
    c[:n] = codes
    q = c.reshape(-1, 4).astype(np.uint32)
    b = (q[:, 0] << 6) | (q[:, 1] << 4) | (q[:, 2] << 2) | q[:, 3]
    b = b.reshape(-1, 4)
    return ((b[:, 0] << 24) | (b[:, 1] << 16) | (b[:, 2] << 8) | b[:, 3]
            ).astype(np.uint32)


def sw_block_rows(sw32: np.ndarray, n_blocks: int) -> np.ndarray:
    """Host: per-block word rows [n_blocks, 33] (32 words + halo)."""
    base = np.arange(n_blocks, dtype=np.int64) * WPB
    idx = base[:, None] + np.arange(WPB + 1)[None, :]
    return np.ascontiguousarray(sw32[idx])


def _grev2_32(x):
    """Reverse the 16 2-bit groups of a u32."""
    m2 = jnp.uint32(0x33333333)
    m4 = jnp.uint32(0x0F0F0F0F)
    m8 = jnp.uint32(0x00FF00FF)
    x = ((x & m2) << 2) | ((x >> 2) & m2)
    x = ((x & m4) << 4) | ((x >> 4) & m4)
    x = ((x & m8) << 8) | ((x >> 8) & m8)
    x = (x << 16) | (x >> 16)
    return x


def _mulhi32(a, b):
    """High 32 bits of a u32 x u32 product via 16-bit splits."""
    a0 = a & jnp.uint32(0xFFFF)
    a1 = a >> 16
    b0 = b & jnp.uint32(0xFFFF)
    b1 = b >> 16
    lo = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    hi = a1 * b1
    carry = (lo >> 16) + (m1 & jnp.uint32(0xFFFF)) + (m2 & jnp.uint32(0xFFFF))
    return hi + (m1 >> 16) + (m2 >> 16) + (carry >> 16)


def _repeat_cols(x_u32, reps, out_cols):
    """Element-repeat along lanes via an exact one-hot matmul: mosaic has no
    minor-dim-merging reshape, but (q // reps == t) selection on the MXU
    moves 8-bit pieces losslessly even through the bf16 multiply path."""
    n = x_u32.shape[1]
    q = jax.lax.broadcasted_iota(jnp.int32, (n, out_cols), 1)
    t = jax.lax.broadcasted_iota(jnp.int32, (n, out_cols), 0)
    R = jnp.where(q // jnp.int32(reps) == t, jnp.float32(1), jnp.float32(0))
    out = jnp.zeros(x_u32.shape[:1] + (out_cols,), jnp.uint32)
    for sh_ in (24, 16, 8, 0):
        piece = ((x_u32 >> jnp.uint32(sh_)) & jnp.uint32(0xFF))             .astype(jnp.int32).astype(jnp.float32)
        rep = jax.lax.dot_general(piece, R, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out = out | (rep.astype(jnp.int32).astype(jnp.uint32)
                     << jnp.uint32(sh_))
    return out


def _make_kernel(k, w, f1_lo_i, f1_hi_i, bo):
    two_k = 2 * k
    top_shift = 32 - two_k

    def kernel(sw_ref, vb_ref, out_ref):
        i = pl.program_id(0)
        swr = sw_ref[...]                      # (TBLK, WPB+1)
        w0 = _repeat_cols(swr[:, :WPB], 16, BLK)      # (TBLK, BLK)
        w1 = _repeat_cols(swr[:, 1:WPB + 1], 16, BLK)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (TBLK, BLK), 1)
        r2 = (lane & jnp.uint32(15)) << 1      # 2 * phase
        fw = jnp.where(r2 == 0, w0,
                       (w0 << r2) | (w1 >> (jnp.uint32(32) - r2)))
        if top_shift:
            low_mask = jnp.uint32((1 << two_k) - 1)
            kmer = fw >> top_shift
            kmer_rc = (~_grev2_32(fw & (jnp.uint32(0xFFFFFFFF)
                                        << top_shift))) & low_mask
        else:
            kmer = fw
            kmer_rc = ~_grev2_32(fw)
        f1_lo = jnp.uint32(f1_lo_i)
        f1_hi = jnp.uint32(f1_hi_i)
        hf = _mulhi32(kmer, f1_lo) + kmer * f1_hi
        hr = _mulhi32(kmer_rc, f1_lo) + kmer_rc * f1_hi
        if top_shift:
            hf = hf >> top_shift
            hr = hr >> top_shift
        isF = hf < hr
        hash_ = jnp.where(isF, hf, hr)
        ckmer = jnp.where(isF, kmer, kmer_rc)

        vbw = _repeat_cols(vb_ref[...], 32, BLK)      # (TBLK, BLK)
        vbit = (vbw >> (lane & jnp.uint32(31))) & jnp.uint32(1)
        if w & (w - 1) == 0:  # power-of-2 d: mask instead of division
            hit = (hash_ & jnp.uint32(w - 1)) == jnp.uint32(0)
        else:
            hit = (hash_ % jnp.uint32(w)) == jnp.uint32(0)
        emit = hit & (vbit == 1)

        pos = (lane + jnp.uint32(BLK) *
               (jax.lax.broadcasted_iota(jnp.uint32, (TBLK, BLK), 0)
                + jnp.uint32(i) * jnp.uint32(TBLK)))

        e2 = jnp.where(emit, jnp.float32(1), jnp.float32(0))
        jj = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
        ut = jnp.where(jj <= kk, jnp.float32(1), jnp.float32(0))
        csum = jax.lax.dot_general(e2, ut, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dest = jnp.where(emit, csum - jnp.float32(1),
                         jnp.float32(-1))
        counts = csum[:, BLK - 1]

        limb_list = [((v >> jnp.uint32(8 * t)) & jnp.uint32(0xFF))
                     .astype(jnp.int32).astype(jnp.float32)
                     for v in (ckmer, pos) for t in (3, 2, 1, 0)]
        c8 = jnp.stack(limb_list, axis=1)      # (TBLK, 8, BLK)
        sel = jax.lax.broadcasted_iota(jnp.int32, (BLK, bo),
                                       1).astype(jnp.float32)
        onehot = jnp.where(dest[:, :, None] == sel[None, :, :],
                           jnp.float32(1), jnp.float32(0))
        out8 = jax.lax.dot_general(c8, onehot, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        cnt_row = jnp.broadcast_to(counts[:, None, None], (TBLK, 1, bo))
        out_ref[...] = jnp.concatenate([out8, cnt_row], axis=1)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "factor1", "C", "bo",
                                    "interpret"))
def pallas_scan_compact(sw_rows, vb_rows, *, k, w, factor1, C, bo,
                        interpret=False):
    """C positions (multiple of TILE).  sw_rows: u32 [C/BLK, 33] per-block
    words (sw_block_rows); vb_rows: u32 [C/BLK, 16] validity bit words.
    Returns out f32 [C/BLK, 9, bo]."""
    assert C % TILE == 0 and k <= 16
    n_tiles = C // TILE
    kern = _make_kernel(k, w, factor1 & 0xFFFFFFFF, factor1 >> 32, bo)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TBLK, WPB + 1), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TBLK, 16), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TBLK, 9, bo), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C // BLK, 9, bo), jnp.float32),
        interpret=interpret,
    )(sw_rows, vb_rows)
    return out


def scan_compact_pallas(sw_rows, vb_rows, *, k, w, factor1, C, bo,
                        interpret=False):
    """Contract of _scan_compact_local: (kmers u64 [C/BLK*bo] block-major
    sentinel-padded, local pos u32, n_emit i64, overflow bool)."""
    out = pallas_scan_compact(sw_rows, vb_rows, k=k, w=w, factor1=factor1,
                              C=C, bo=bo, interpret=interpret)
    o = out.astype(jnp.uint32)

    def u32_of(i):
        return ((o[:, i, :] << 24) | (o[:, i + 1, :] << 16)
                | (o[:, i + 2, :] << 8) | o[:, i + 3, :])

    okmer = u32_of(0).astype(jnp.uint64)
    opos = u32_of(4)
    cnts = out[:, 8, 0].astype(jnp.int32)
    live = (jax.lax.broadcasted_iota(jnp.int32, okmer.shape, 1)
            < cnts[:, None])
    out_k = jnp.where(live, okmer, jnp.uint64(0xFFFFFFFFFFFFFFFF)).reshape(-1)
    out_p = jnp.where(live, opos, jnp.uint32(0xFFFFFFFF)).reshape(-1)
    n_emit = jnp.sum(cnts.astype(jnp.int64))
    overflow = jnp.any(cnts > bo)
    return out_k, out_p, n_emit, overflow
