"""Fused Pallas scan+compact kernel (k <= 16): the flagship TPU kernel.

One VMEM-resident pass replaces the XLA pipeline front+compaction whose
intermediates (canonical kmers, emit mask, one-hot cube) dominate HBM
traffic — measured 11-13 ms per 2^24 positions on v5e for the XLA one-hot
path vs the ~0.14 GB/chunk this kernel moves.

Decomposition (all element-parallel — no sequential dependency chains,
which Mosaic punishes):

- tile (grid step) = 2^17 consecutive packed u32 words; in-kernel loop over
  the 16 funnel phases r; for phase r, position 16*j + r of word j is
  extracted with a two-word funnel shift (the same O(1)-per-position trick
  as the XLA path, parallel/sharded.py _scan_front, derived from the
  reference's rolling iterator semantics, seqhash.c:60-79, seqhash.h:58).
- canonical hash in u32: for 2k <= 32,
  hash = ((kmer * factor1) mod 2^64) >> (64-2k)
       = (umulhi(kmer, f1_lo) + kmer * f1_hi) >> (32-2k),
  computed with 16-bit partial products (Mosaic has no u64).
- emit test hash % w == 0 without division: w = 2^t * odd, divisible iff
  low t bits are 0 and (hash >> t) * inverse(odd) mod 2^32 <= (2^32-1)/odd.
- compaction: blocks are LANE COLUMNS of a [1024, 128] tile view (block =
  (tile, phase, lane), 1024 stride-2048-base positions).  In-block
  exclusive counts by a Hillis-Steele scan over the sublane axis, then a
  10-stage butterfly of conditional axis-0 rolls routes emitted rows to the
  block head.  Monotone displacements make the routing collision-free, and
  a wrapped roll arrival can never be taken (an element at row p has
  displacement <= p < 2^b).  Payload = (kmer, (p << 1) | isF).

Output rows per block are sentinel-padded to ``bo`` (overflow flagged via
per-block counts; callers widen and replay).  The host reconstructs the
stream position as 16*(tile*2^17 + p*128 + lane) + phase.
"""

import functools

import numpy as np

import modimizer_tpu

modimizer_tpu.configure_jax()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLKP = 1024                    # rows per tile (axis 0), default
TILE_W = BLKP * LANES          # packed words per tile = 2^17
POS_PER_TILE = 16 * TILE_W     # 2^21 positions


def _umulhi(a, c):
    """High 32 bits of u32 a * u32 constant c (16-bit partial products)."""
    cl = jnp.uint32(c & 0xFFFF)
    ch = jnp.uint32(c >> 16)
    al = a & jnp.uint32(0xFFFF)
    ah = a >> jnp.uint32(16)
    t = al * cl
    u = ah * cl + (t >> jnp.uint32(16))
    v = al * ch + (u & jnp.uint32(0xFFFF))
    return ah * ch + (u >> jnp.uint32(16)) + (v >> jnp.uint32(16))


def _emit_test(w):
    """hash % w == 0 as multiply-compare (no division)."""
    t2 = (w & -w).bit_length() - 1
    odd = w >> t2
    if odd == 1:
        def f(h):
            return (h & jnp.uint32(w - 1)) == jnp.uint32(0)
    else:
        oinv = pow(odd, -1, 1 << 32)
        lim = 0xFFFFFFFF // odd
        def f(h):
            h2 = h >> jnp.uint32(t2) if t2 else h
            ok = (h2 * jnp.uint32(oinv)) <= jnp.uint32(lim)
            if t2:
                ok &= (h & jnp.uint32((1 << t2) - 1)) == jnp.uint32(0)
            return ok
    return f


def _grev2_comp(x):
    """Per-word RC stream word: complement of 2-bit-group reversal."""
    m2 = jnp.uint32(0x33333333)
    m4 = jnp.uint32(0x0F0F0F0F)
    m8 = jnp.uint32(0x00FF00FF)
    x = ((x & m2) << jnp.uint32(2)) | ((x >> jnp.uint32(2)) & m2)
    x = ((x & m4) << jnp.uint32(4)) | ((x >> jnp.uint32(4)) & m4)
    x = ((x & m8) << jnp.uint32(8)) | ((x >> jnp.uint32(8)) & m8)
    x = (x << jnp.uint32(16)) | (x >> jnp.uint32(16))
    return ~x


def _make_kernel(k, w, factor1, bo, blkp, use_pltpu_roll):
    two_k = 2 * k
    mask_keep = np.uint32((1 << two_k) - 1)
    f1lo = int(factor1 & 0xFFFFFFFF)
    f1hi = int((factor1 >> 32) & 0xFFFFFFFF)
    hshift = 32 - two_k
    is_emit = _emit_test(w)

    def hash32(kmer):
        h = _umulhi(kmer, f1lo) + kmer * jnp.uint32(f1hi)
        if hshift:
            h = h >> jnp.uint32(hshift)
        return h

    if use_pltpu_roll:
        def _roll_dn(x, s):   # [i] = x[i - s]  (toward higher indices)
            return pltpu.roll(x, jnp.int32(s), 0)

        def _roll_up(x, s):   # [i] = x[i + s]
            return pltpu.roll(x, jnp.int32(blkp - s), 0)
    else:
        def _roll_dn(x, s):
            return jnp.roll(x, s, axis=0)

        def _roll_up(x, s):
            return jnp.roll(x, -s, axis=0)

    def kernel(w0_ref, w1_ref, t0_ref, t1_ref, vm_ref,
               outk_ref, outm_ref, cnt_ref):
        """Grid = (T, 16): one funnel phase r per inner grid step, so only
        one phase's temporaries are live in VMEM at a time (all 16 unrolled
        in one step blows the 16 MB scoped-vmem budget)."""
        w0 = w0_ref[0]              # [blkp, 128] u32
        w1 = w1_ref[0]
        t0v = t0_ref[0]
        t1v = t1_ref[0]
        vm = vm_ref[0]
        r = pl.program_id(1)
        sr = jnp.uint32(2 * r)
        sl = jnp.uint32((32 - 2 * r) & 31)   # r=0 masked by the where below
        is0 = r == 0
        hs = jnp.where(is0, w0, (w0 << sr) | (w1 >> sl))
        ht = jnp.where(is0, t0v, (t0v >> sr) | (t1v << sl))
        riota = jax.lax.broadcasted_iota(jnp.uint32, (blkp, LANES), 0)
        h = (hs >> jnp.uint32(32 - two_k)) & mask_keep
        hrc = ht & mask_keep
        hf = hash32(h)
        hr = hash32(hrc)
        isF = hf < hr
        hsh = jnp.where(isF, hf, hr)
        km = jnp.where(isF, h, hrc)
        emit = is_emit(hsh) & (((vm >> jnp.uint32(r))
                                & jnp.uint32(1)) == jnp.uint32(1))
        # in-column (axis 0) inclusive count via Hillis-Steele
        ei = emit.astype(jnp.uint32)
        cs = ei
        s = 1
        while s < blkp:
            rolled = _roll_dn(cs, s)
            cs = cs + jnp.where(riota >= jnp.uint32(s), rolled,
                                jnp.uint32(0))
            s <<= 1
        move = jnp.where(emit, riota - (cs - ei), jnp.uint32(0))
        ck = jnp.where(emit, km, jnp.uint32(0xFFFFFFFF))
        cm = jnp.where(emit,
                       (riota << jnp.uint32(1)) | isF.astype(jnp.uint32),
                       jnp.uint32(0xFFFFFFFF))
        for b in range(blkp.bit_length() - 1):
            sft = 1 << b
            move_sh = _roll_up(move, sft)
            arrive = ((move_sh >> jnp.uint32(b))
                      & jnp.uint32(1)) == jnp.uint32(1)
            leave = ((move >> jnp.uint32(b))
                     & jnp.uint32(1)) == jnp.uint32(1)
            ck = jnp.where(arrive, _roll_up(ck, sft), ck)
            cm = jnp.where(arrive, _roll_up(cm, sft), cm)
            move = jnp.where(arrive, move_sh - jnp.uint32(sft),
                             jnp.where(leave, jnp.uint32(0), move))
        cnt = cs[blkp - 1].astype(jnp.int32)
        live = (jax.lax.broadcasted_iota(jnp.int32, (bo, LANES), 0)
                < cnt[None, :])
        outk_ref[0, 0] = jnp.where(live, ck[:bo], jnp.uint32(0xFFFFFFFF))
        outm_ref[0, 0] = jnp.where(live, cm[:bo], jnp.uint32(0xFFFFFFFF))
        cnt_ref[0, 0] = jnp.broadcast_to(cnt[None, :], (8, LANES))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "factor1", "bo", "interpret",
                                    "use_pltpu_roll"))
def scan_compact_tiles(w0, w1, vmask, *, k, w, factor1, bo, interpret=False,
                       use_pltpu_roll=True):
    """w0/w1/vmask: u32 [T, 1024, 128] — word j of tile t at [t, j//128,
    j%128]; w1 = next word; vmask bit r = validity of position 16*j + r.
    Returns (out_k u32 [T,16,bo,128], out_m u32 = (p<<1)|isF, cnt i32
    [T,16,8,128] — row-padded to the TPU tile, take [:, :, 0, :])."""
    T, blkp, _l = w0.shape
    tile_w = blkp * LANES
    kern = _make_kernel(k, w, factor1, bo, blkp, use_pltpu_roll)
    tw0 = _grev2_comp(w0)
    tw1 = _grev2_comp(w1)
    return pl.pallas_call(
        kern,
        grid=(T, 16),
        in_specs=[pl.BlockSpec((1, blkp, LANES),
                               lambda t, r: (t, t * 0, t * 0),
                               memory_space=pltpu.VMEM)] * 5,
        out_specs=[
            pl.BlockSpec((1, 1, bo, LANES),
                         lambda t, r: (t, r, t * 0, t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bo, LANES),
                         lambda t, r: (t, r, t * 0, t * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, LANES),
                         lambda t, r: (t, r, t * 0, t * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 16, bo, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((T, 16, bo, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((T, 16, 8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(w0, w1, tw0, tw1, vmask)


def host_layout(sw32: np.ndarray, valid16: np.ndarray, T: int,
                blkp: int = BLKP):
    """Host-side tile layout from a flat packed u32 word stream (+1 halo
    word) and per-word 16-bit validity masks."""
    tile_w = blkp * LANES
    n = T * tile_w
    w0 = sw32[:n].reshape(T, blkp, LANES)
    w1 = sw32[1:n + 1].reshape(T, blkp, LANES)
    vm = valid16[:n].astype(np.uint32).reshape(T, blkp, LANES)
    return w0, w1, vm


def gpos_of(T: int, bo: int):
    """Vectorized stream-position reconstruction for the output layout:
    gpos[t, r, s, l] for payload row p: 16*(t*2^17 + p*128 + l) + r."""
    def f(out_m):
        p = out_m >> 1
        t = np.arange(T, dtype=np.int64)[:, None, None, None]
        r = np.arange(16, dtype=np.int64)[None, :, None, None]
        l = np.arange(LANES, dtype=np.int64)[None, None, None, :]
        return 16 * (t * TILE_W + p.astype(np.int64) * LANES + l) + r
    return f
