"""Pallas scan+compact kernel, MXU-compaction variant (k <= 16).

Round-3 redesign of ops/scan_kernel.py: the round-2 kernel compacted with
butterflies of conditional rolls, which Mosaic lowers far from
1-op-per-element (411-704 Mpos/s).  This kernel has NO rolls and NO
transposes anywhere; every data-movement step is either elementwise VPU
work or an MXU matmul:

- words ride TRANSPOSED: tile = u32[128, R], word j of the stream at
  [j % 128, j // 128], so a compaction *block* is one sublane row of R
  words (R positions per funnel phase, processed 16 phases per tile).
  Within-block order is (word, phase)-arbitrary — every consumer is
  order-free (host sorts by the returned stream position).
- front (per phase r): two-word funnel shift, canonical u32 hash
  ((kmer * factor1 mod 2^64) >> (64-2k), seqhash.h:58) via 16-bit partial
  products (Mosaic has no u64), emit test hash % w == 0 by
  multiply-compare (no division).  Bit-exact vs the XLA front
  (parallel/sharded.py _scan_front) — regression-tested.
- in-block ranks: hierarchical prefix — eight [128,128] @ TRI128
  inclusive-triangular MXU dots (exact in f32) + chunk-offset fix-up on
  the VPU.  A single R-wide triangular dot would cost C*R MACs; the
  hierarchy costs C*128.
- compaction: per 32-row sublane group, a [32, bo, R] bf16 one-hot cube
  is generated in VMEM (never touches HBM — the XLA path materializes
  3.2 GB of it per 2^24 positions, its dominant cost) and contracted
  against 8-bit limb planes of (kmer, meta) on the MXU.

Output rows carry (kmer u32, meta u32 = (tile-local pos << 1) | isF) with
0xFFFFFFFF sentinels, plus global emit-count and max-block-count scalars
(host widens bo and replays on overflow, exactly like the XLA path).
"""

import functools

import numpy as np

import modimizer_tpu

modimizer_tpu.configure_jax()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scan_kernel import _emit_test, _grev2_comp, _umulhi

LANES = 128
R_DEFAULT = 1024           # words per block row (positions/block/phase)
SUB_DEFAULT = 32           # sublane rows per compaction dot group


def _make_kernel(k, w, factor1, bo, R, SUB, nq, stage=3):
    two_k = 2 * k
    mask_keep = np.uint32((1 << two_k) - 1)
    f1lo = int(factor1 & 0xFFFFFFFF)
    f1hi = int((factor1 >> 32) & 0xFFFFFFFF)
    hshift = 32 - two_k
    is_emit = _emit_test(w)
    NCH = R // LANES           # 128-wide prefix chunks per block row

    def hash32(kmer):
        h = _umulhi(kmer, f1lo) + kmer * jnp.uint32(f1hi)
        if hshift:
            h = h >> jnp.uint32(hshift)
        return h

    def kernel(w0_ref, w1_ref, vm_ref, outk_ref, outm_ref, tot_ref, ovf_ref,
               t0s, t1s, kms, cms, dests, cnts, acc):
        t = pl.program_id(0)
        r = pl.program_id(1)
        q = pl.program_id(2)
        first = (t == 0) & (r == 0) & (q == 0)

        @pl.when(first)
        def _():
            acc[0] = jnp.int32(0)
            acc[1] = jnp.int32(0)

        @pl.when((r == 0) & (q == 0))
        def _():
            t0s[...] = _grev2_comp(w0_ref[0])
            t1s[...] = _grev2_comp(w1_ref[0])

        @pl.when(q == 0)
        def _():
            w0 = w0_ref[0]
            w1 = w1_ref[0]
            sr = jnp.uint32(2) * r.astype(jnp.uint32)
            sl = (jnp.uint32(32) - sr) & jnp.uint32(31)
            is0 = r == 0
            hs = jnp.where(is0, w0, (w0 << sr) | (w1 >> sl))
            ht = jnp.where(is0, t0s[...], (t0s[...] >> sr) | (t1s[...] << sl))
            h = (hs >> jnp.uint32(hshift)) & mask_keep if hshift else hs
            hrc = ht & mask_keep
            if stage == 0:  # ablation: no multiply-hash
                hf, hr = h, hrc
            else:
                hf = hash32(h)
                hr = hash32(hrc)
            isF = hf < hr
            hsh = jnp.where(isF, hf, hr)
            km = jnp.where(isF, h, hrc)
            emit = is_emit(hsh) & (((vm_ref[0] >> r.astype(jnp.uint32))
                                    & jnp.uint32(1)) == jnp.uint32(1))
            # meta = (stream-pos-in-tile << 1) | isF;  pos = 16*word + r,
            # word = i*128 + l at array slot [l, i]
            li = jax.lax.broadcasted_iota(jnp.uint32, (LANES, R), 0)
            wi = jax.lax.broadcasted_iota(jnp.uint32, (LANES, R), 1)
            pos = (jnp.uint32(16) * (wi * jnp.uint32(LANES) + li)
                   + r.astype(jnp.uint32))
            kms[...] = km
            cms[...] = (pos << jnp.uint32(1)) | isF.astype(jnp.uint32)
            if stage == -1:  # ablation: front only, no prefix
                dests[...] = jnp.where(emit, jnp.int32(0), jnp.int32(-1))
                cnts[...] = jnp.zeros((LANES, 1), jnp.int32)
                acc[0] = acc[0] + jnp.int32(1)
                acc[1] = jnp.int32(0)
                return
            # hierarchical in-row prefix: TRI128 dots per 128-lane chunk
            tri = (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                   <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
                   ).astype(jnp.bfloat16)
            e16 = emit.astype(jnp.bfloat16)
            off = jnp.zeros((LANES, 1), jnp.float32)
            for c in range(NCH):
                sl_ = slice(c * LANES, (c + 1) * LANES)
                cs_c = jax.lax.dot_general(
                    e16[:, sl_], tri, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                csg = cs_c + off
                # explicit i32 literals: with jax x64 on, bare ints become
                # i64 scalars, which Mosaic cannot convert
                dests[:, sl_] = jnp.where(
                    emit[:, sl_], csg.astype(jnp.int32) - jnp.int32(1),
                    jnp.int32(-1))
                off = csg[:, LANES - 1:LANES]
            cnt = off.astype(jnp.int32)            # [128, 1] per-block emits
            cnts[...] = cnt
            # keepdims reductions + [0,0] extract: Mosaic's reduce-to-scalar
            # proxy re-traces under the ambient x64 config and emits i64
            s_ = jnp.sum(cnt, axis=0, keepdims=True, dtype=jnp.int32)
            m_ = jnp.max(cnt, axis=0, keepdims=True)
            acc[0] = acc[0] + s_[0, 0]
            acc[1] = jnp.maximum(acc[1], m_[0, 0])

        if stage < 2:  # ablation: front+csum only
            outk_ref[0, 0] = jnp.zeros((SUB, bo), jnp.uint32)
            outm_ref[0, 0] = jnp.zeros((SUB, bo), jnp.uint32)
            tot_ref[0, 0] = acc[0]
            ovf_ref[0, 0] = acc[1]
            return
        sub = pl.ds(q * SUB, SUB)
        d = dests[sub, :]                           # [SUB, R]
        km_s = kms[sub, :]
        cm_s = cms[sub, :]
        # full-shape iota: Mosaic rejects unit-minor-dim reshapes/iotas
        boi = jax.lax.broadcasted_iota(jnp.int32, (SUB, bo, R), 1)
        cube = (d[:, None, :] == boi).astype(jnp.bfloat16)   # [SUB, bo, R]

        # cols [SUB, R, 8]: lanes 0-3 = kmer limbs hi->lo, 4-7 = meta limbs.
        # Built by broadcast + per-lane variable shift — Mosaic rejects the
        # unit-minor reshapes a jnp.stack would need, and batched mat-vec
        # (rhs without a free dim) is unsupported, so the limb axis must be
        # materialized as a real N dimension.
        # limb axis on SUBLANES ([SUB, 8, R]): in [SUB, R, 8] order the
        # minor dim pads 8 -> 128 lanes and every elementwise op runs 16x
        # over (measured 22 ms/step vs 9 without); the dot contracts both
        # minor dims (transposed-rhs matmul)
        km_bc = jax.lax.broadcast_in_dim(km_s, (SUB, 8, R), (0, 2))
        cm_bc = jax.lax.broadcast_in_dim(cm_s, (SUB, 8, R), (0, 2))
        lane8 = jax.lax.broadcasted_iota(jnp.uint32, (SUB, 8, R), 1)
        src = jnp.where(lane8 < jnp.uint32(4), km_bc, cm_bc)
        sh8 = jnp.uint32(24) - jnp.uint32(8) * (lane8 & jnp.uint32(3))
        cols = ((src >> sh8) & jnp.uint32(0xFF)
                ).astype(jnp.int32).astype(jnp.bfloat16)
        if stage < 3:  # ablation: no compaction dot — fold cube+cols cheap
            outk_ref[0, 0] = (jnp.sum(cube, axis=2, dtype=jnp.float32)
                              .astype(jnp.int32).astype(jnp.uint32))
            outm_ref[0, 0] = (jnp.sum(cols, axis=1, dtype=jnp.float32)
                              [:, :bo].astype(jnp.int32).astype(jnp.uint32))
            tot_ref[0, 0] = acc[0]
            ovf_ref[0, 0] = acc[1]
            return
        o = jax.lax.dot_general(cube, cols, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        ou = o.astype(jnp.int32).astype(jnp.uint32)          # [SUB, bo, 8]
        lane_o = jax.lax.broadcasted_iota(jnp.uint32, (SUB, bo, 8), 2)
        shv = jnp.uint32(24) - jnp.uint32(8) * (lane_o & jnp.uint32(3))
        # pack in s32 (unsigned reductions unsupported; wraparound add is
        # bit-identical mod 2^32)
        vals = (ou << shv).astype(jnp.int32)
        zero = jnp.int32(0)
        okk = jnp.sum(jnp.where(lane_o < jnp.uint32(4), vals, zero),
                      axis=2, dtype=jnp.int32).astype(jnp.uint32)
        omm = jnp.sum(jnp.where(lane_o < jnp.uint32(4), zero, vals),
                      axis=2, dtype=jnp.int32).astype(jnp.uint32)
        # dead rows (rank >= cnt) contract to all-zero limbs, and a real
        # row CAN legitimately be all-zero (fwd kmer 0 at tile position 0)
        # -> liveness from the per-block counts, not the values
        live = (jax.lax.broadcasted_iota(jnp.int32, (SUB, bo), 1)
                < cnts[sub, :])                     # [SUB, bo]
        outk_ref[0, 0] = jnp.where(live, okk, jnp.uint32(0xFFFFFFFF))
        outm_ref[0, 0] = jnp.where(live, omm, jnp.uint32(0xFFFFFFFF))
        tot_ref[0, 0] = acc[0]
        ovf_ref[0, 0] = acc[1]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "factor1", "bo", "R", "SUB",
                                    "interpret", "stage"))
def scan_compact_mxu(w32, v16, *, k, w, factor1, bo, R=R_DEFAULT,
                     SUB=SUB_DEFAULT, interpret=False, stage=3):
    """w32: u32 [n+1] packed words (16 bases each, big-endian-per-word; one
    halo word past the scanned range); v16: u32 [n+1], bit r = validity of
    position 16*j + r.  n must be T*128*R.  Returns (out_k u32
    [T, 16, 128, bo], out_m u32 (meta, 0xFFFFFFFF sentinels), total i32
    [1,1], maxcnt i32 [1,1]).  Stream position of a row: 2^21-scale
    tile base T_INDEX*16*128*R + (meta >> 1)."""
    assert k <= 16
    n = w32.shape[0] - 1
    T = n // (LANES * R)
    assert T * LANES * R == n
    nq = LANES // SUB

    def prep(a):
        return a[:n].reshape(T, R, LANES).transpose(0, 2, 1)

    w0t = prep(w32)
    w1t = prep(jax.lax.dynamic_slice_in_dim(w32, 1, n))
    vmt = prep(v16)
    kern = _make_kernel(k, w, factor1, bo, R, SUB, nq, stage=stage)
    grid = (T, 16, nq)
    outk, outm, tot, ovf = pl.pallas_call(
        kern,
        grid=grid,
        # literal 0 in an index map traces as i64 under jax x64 (Mosaic
        # can't return i64) -> t*0
        in_specs=[pl.BlockSpec((1, LANES, R), lambda t, r, q: (t, t * 0,
                                                               t * 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=[
            pl.BlockSpec((1, 1, SUB, bo), lambda t, r, q: (t, r, q, t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, bo), lambda t, r, q: (t, r, q, t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t, r, q: (t * 0, t * 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda t, r, q: (t * 0, t * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 16, LANES, bo), jnp.uint32),
            jax.ShapeDtypeStruct((T, 16, LANES, bo), jnp.uint32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LANES, R), jnp.uint32),    # t0s
            pltpu.VMEM((LANES, R), jnp.uint32),    # t1s
            pltpu.VMEM((LANES, R), jnp.uint32),    # kms
            pltpu.VMEM((LANES, R), jnp.uint32),    # cms
            pltpu.VMEM((LANES, R), jnp.int32),     # dests
            pltpu.VMEM((LANES, 1), jnp.int32),     # cnts
            pltpu.SMEM((2,), jnp.int32),           # acc: total, maxcnt
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w0t, w1t, vmt)
    return outk, outm, tot, ovf


def host_gpos(out_m: np.ndarray, R: int = R_DEFAULT):
    """Vectorized tile-local stream positions + isF from the meta planes:
    out_m [T, 16, 128, bo] -> (gpos int64 [same], isF bool)."""
    per_tile = 16 * LANES * R
    t = np.arange(out_m.shape[0], dtype=np.int64).reshape(-1, 1, 1, 1)
    p = (out_m >> 1).astype(np.int64)
    return t * per_tile + p, (out_m & 1) == 1
