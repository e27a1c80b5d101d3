"""Probe: where does the scan front's time go, and can the MXU absorb the
hash multiplies?

The round-4 Pallas front (phases-on-sublanes, 16-bit-decomposed mulhi32)
measured 3.63 ms/2^24 — ~17x the VPU's theoretical elementwise floor.
Hypothesis: 32-bit integer MULTIPLIES are emulated many-ops on the v5e VPU
and dominate.  Three kernels, identical shapes:

  nohash : funnel + trivial emit (kf & 15 == 0) — no multiplies at all.
           The gap to `mul16` is the price of the 10 u32 multiplies.
  mul16  : the round-4 kernel (funnel + both-strand hash via 16-bit
           decomposition) — the current baseline.
  mxu    : hash partials as ONE tiny bf16 matmul per tile —
           hash32_hi(a) = low32(a*Fh) + mulhi32(a, Fl) is LINEAR in the
           byte limbs of a: W[s, i] = limb_{s-i}(F*), so
           [22, 8] @ [8, MJ] gives every partial sum exactly (products
           <= 255^2, f32 accumulate exact), and a short u32 carry chain
           rebuilds both strands' hashes.  Grid = (16 phases x blocks):
           per-step funnel shifts are CONSTANTS and limbs sit naturally
           on sublanes — no relayouts anywhere.

Correctness: every kernel's (kmer, emit) planes vs _scan_front_u32.
Usage: python scripts/probe_front_mxu.py [C_log2] [MJ]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import modimizer_tpu  # noqa: F401

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modimizer_tpu.core.seqhash import Seqhash
from modimizer_tpu.ops.packed import derive_tw, mod_is_zero, pack_sw
from modimizer_tpu.parallel.sharded import _scan_front_u32

K, W, SEED = 16, 16, 17
C_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 24
MJ = int(sys.argv[2]) if len(sys.argv) > 2 else 4096


def make_streams(sw):
    tw = derive_tw(sw)
    hi = (sw >> jnp.uint64(32)).astype(jnp.uint32)
    lo = sw.astype(jnp.uint32)
    P = jnp.stack([hi, lo], axis=1).reshape(-1)
    thi = (tw >> jnp.uint64(32)).astype(jnp.uint32)
    tlo = tw.astype(jnp.uint32)
    Z = jnp.stack([tlo, thi], axis=1).reshape(-1)
    return P, Z


def funnel(pa, pb, za, zb, s2):
    inv = jnp.uint32(32) - s2
    zero = s2 == jnp.uint32(0)
    kf = jnp.where(zero, pa, (pa << s2) | (pb >> inv))
    kr = jnp.where(zero, za, (za >> s2) | (zb << inv))
    return kf, kr


def hash32_hi_mul16(a, factor1):
    Fl = factor1 & 0xFFFFFFFF
    b0 = jnp.uint32(Fl & 0xFFFF)
    b1 = jnp.uint32(Fl >> 16)
    Fh = jnp.uint32((factor1 >> 32) & 0xFFFFFFFF)
    a0 = a & jnp.uint32(0xFFFF)
    a1 = a >> jnp.uint32(16)
    c = a1 * b0 + ((a0 * b0) >> jnp.uint32(16))
    d = a0 * b1
    carry = ((c >> jnp.uint32(16)) + (d >> jnp.uint32(16))
             + (((c & jnp.uint32(0xFFFF)) + (d & jnp.uint32(0xFFFF)))
                >> jnp.uint32(16)))
    return a1 * b1 + carry + a * Fh


# ---- W matrix for the MXU variant: rows = 11 partials per strand ----

def make_W(factor1):
    bl = [(factor1 >> (8 * j)) & 0xFF for j in range(4)]          # Fl limbs
    bh = [(factor1 >> (32 + 8 * j)) & 0xFF for j in range(4)]     # Fh limbs
    W1 = np.zeros((11, 4), np.float32)
    for s in range(7):                 # p_s = sum_{i+j=s} a_i * bl_j
        for i in range(4):
            j = s - i
            if 0 <= j < 4:
                W1[s, i] = bl[j]
    for s in range(4):                 # q_s = sum_{i+j=s} a_i * bh_j
        for i in range(4):
            j = s - i
            if 0 <= j < 4:
                W1[7 + s, i] = bh[j]
    Wf = np.zeros((22, 8), np.float32)
    Wf[:11, :4] = W1
    Wf[11:, 4:] = W1
    return Wf.astype(jnp.bfloat16.dtype if hasattr(jnp.bfloat16, 'dtype')
                     else np.float32)


def carries(p):
    """p: list of 11 u32 partial rows -> hash32 row."""
    c01 = p[0] + (p[1] << jnp.uint32(8))
    c23 = p[2] + (p[3] << jnp.uint32(8))
    mid = (c01 >> jnp.uint32(16)) + c23
    hi = ((mid >> jnp.uint32(16)) + p[4] + (p[5] << jnp.uint32(8))
          + (p[6] << jnp.uint32(16)))
    lo = (p[7] + (p[8] << jnp.uint32(8)) + (p[9] << jnp.uint32(16))
          + (p[10] << jnp.uint32(24)))
    return hi + lo


def kern_nohash(pa_ref, pb_ref, za_ref, zb_ref, out_ref):
    pa = jnp.broadcast_to(pa_ref[0:1, :], (16, MJ))
    pb = jnp.broadcast_to(pb_ref[0:1, :], (16, MJ))
    za = jnp.broadcast_to(za_ref[0:1, :], (16, MJ))
    zb = jnp.broadcast_to(zb_ref[0:1, :], (16, MJ))
    s2 = jax.lax.broadcasted_iota(jnp.uint32, (16, MJ), 0) * jnp.uint32(2)
    kf, kr = funnel(pa, pb, za, zb, s2)
    emit = ((kf ^ kr) & jnp.uint32(15)) == jnp.uint32(0)
    n = jnp.sum(emit.astype(jnp.int32).astype(jnp.float32))

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0)

    out_ref[0, 0] += n


def kern_mul16(pa_ref, pb_ref, za_ref, zb_ref, out_ref, *, factor1, w):
    pa = jnp.broadcast_to(pa_ref[0:1, :], (16, MJ))
    pb = jnp.broadcast_to(pb_ref[0:1, :], (16, MJ))
    za = jnp.broadcast_to(za_ref[0:1, :], (16, MJ))
    zb = jnp.broadcast_to(zb_ref[0:1, :], (16, MJ))
    s2 = jax.lax.broadcasted_iota(jnp.uint32, (16, MJ), 0) * jnp.uint32(2)
    kf, kr = funnel(pa, pb, za, zb, s2)
    hf = hash32_hi_mul16(kf, factor1)
    hr = hash32_hi_mul16(kr, factor1)
    isF = hf < hr
    h = jnp.where(isF, hf, hr)
    emit = (h & jnp.uint32(w - 1)) == jnp.uint32(0)
    n = jnp.sum(emit.astype(jnp.int32).astype(jnp.float32))

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0)

    out_ref[0, 0] += n


def mxu_phase_body(pa, pb, za, zb, Wt, *, s2, w):
    """One phase row [1, MJ]: uniform funnel shift (s2 = traced scalar),
    limb matmul, carries."""
    zero = s2 == jnp.uint32(0)
    inv = jnp.uint32(32) - s2
    kf = jnp.where(zero, pa, (pa << s2) | (pb >> inv))
    kr = jnp.where(zero, za, (za >> s2) | (zb << inv))
    # limbs on sublanes: [8, MJ] bf16 (4 kf + 4 kr)
    limbs = [((kf >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)) for i in range(4)]
    limbs += [((kr >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)) for i in range(4)]
    A = jnp.concatenate([l.reshape(1, MJ) for l in limbs], axis=0)
    A = A.astype(jnp.int32).astype(jnp.bfloat16)
    P = jax.lax.dot_general(Wt, A, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [22, MJ]
    pr = [P[i:i + 1, :].astype(jnp.int32).astype(jnp.uint32)
          for i in range(22)]
    hf = carries(pr[:11])
    hr = carries(pr[11:])
    isF = hf < hr
    h = jnp.where(isF, hf, hr)
    emit = (h & jnp.uint32(w - 1)) == jnp.uint32(0)
    km = jnp.where(isF, kf, kr)
    return km, emit


def kern_mxu(pa_ref, pb_ref, za_ref, zb_ref, w_ref, out_ref, *, w):
    s2 = (pl.program_id(0) % 16).astype(jnp.uint32) * jnp.uint32(2)
    km, emit = mxu_phase_body(pa_ref[0:1, :], pb_ref[0:1, :],
                              za_ref[0:1, :], zb_ref[0:1, :], w_ref[...],
                              s2=s2, w=w)
    n = jnp.sum(emit.astype(jnp.int32).astype(jnp.float32))

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[0, 0] = jnp.float32(0)

    out_ref[0, 0] += n


def kern_mxu_planes(pa_ref, pb_ref, za_ref, zb_ref, w_ref, km_ref, em_ref,
                    *, w):
    s2 = (pl.program_id(0) % 16).astype(jnp.uint32) * jnp.uint32(2)
    km, emit = mxu_phase_body(pa_ref[0:1, :], pb_ref[0:1, :],
                              za_ref[0:1, :], zb_ref[0:1, :], w_ref[...],
                              s2=s2, w=w)
    km_ref[...] = km
    em_ref[...] = emit.astype(jnp.int8)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    sh = Seqhash.create(K, W, SEED)
    C = 1 << C_LOG2
    NJ = C // 16
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, C + K - 1).astype(np.uint8)
    sw = jnp.asarray(pack_sw(codes, C // 32 + 2))
    Wmat = jnp.asarray(make_W(sh.factor1), jnp.bfloat16)

    @jax.jit
    def prep(sw):
        P, Z = make_streams(sw)
        return P[:NJ], P[1:NJ + 1], Z[:NJ], Z[1:NJ + 1]

    pa, pb, za, zb = prep(sw)

    def pcall4(kern_fn):
        grid = NJ // MJ
        return pl.pallas_call(
            kern_fn,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, MJ), lambda g: (g * 0, g),
                                   memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec((1, 1), lambda g: (g * 0, g * 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))

    @jax.jit
    def run_nohash(pa, pb, za, zb):
        return pcall4(kern_nohash)(
            pa.reshape(1, NJ), pb.reshape(1, NJ),
            za.reshape(1, NJ), zb.reshape(1, NJ))

    @jax.jit
    def run_mul16(pa, pb, za, zb):
        kern = functools.partial(kern_mul16, factor1=sh.factor1, w=W)
        return pcall4(kern)(
            pa.reshape(1, NJ), pb.reshape(1, NJ),
            za.reshape(1, NJ), zb.reshape(1, NJ))

    # mxu: grid (16 phases x blocks); stream rows are the SAME for every
    # phase (index_map ignores the phase coordinate)
    def pcall_mxu(kern_fn, out_shape, out_specs):
        grid = (16, NJ // MJ)
        return pl.pallas_call(
            kern_fn,
            grid=grid,
            in_specs=[pl.BlockSpec((1, MJ), lambda s, g: (g * 0, g),
                                   memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec((22, 8), lambda s, g: (0, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=out_specs,
            out_shape=out_shape)

    @jax.jit
    def run_mxu(pa, pb, za, zb):
        kern = functools.partial(kern_mxu, w=W)

        def kern2(pa_ref, pb_ref, za_ref, zb_ref, w_ref, out_ref):
            return kern(pa_ref, pb_ref, za_ref, zb_ref, w_ref, out_ref)
        return pcall_mxu(
            kern2, jax.ShapeDtypeStruct((1, 1), jnp.float32),
            pl.BlockSpec((1, 1), lambda s, g: (0, 0),
                         memory_space=pltpu.SMEM))(
            pa.reshape(1, NJ), pb.reshape(1, NJ),
            za.reshape(1, NJ), zb.reshape(1, NJ), Wmat)

    @jax.jit
    def run_mxu_planes(pa, pb, za, zb):
        kern = functools.partial(kern_mxu_planes, w=W)

        def kern2(pa_ref, pb_ref, za_ref, zb_ref, w_ref, km_ref, em_ref):
            return kern(pa_ref, pb_ref, za_ref, zb_ref, w_ref, km_ref,
                        em_ref)
        return pcall_mxu(
            kern2,
            (jax.ShapeDtypeStruct((16, NJ), jnp.uint32),
             jax.ShapeDtypeStruct((16, NJ), jnp.int8)),
            (pl.BlockSpec((1, MJ), lambda s, g: (s, g),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, MJ), lambda s, g: (s, g),
                          memory_space=pltpu.VMEM)))(
            pa.reshape(1, NJ), pb.reshape(1, NJ),
            za.reshape(1, NJ), zb.reshape(1, NJ), Wmat)

    @jax.jit
    def xla_front(sw):
        hashes, kmers, pos, isF = _scan_front_u32(sw, k=K,
                                                  factor1=sh.factor1, C=C)
        emit = mod_is_zero(hashes, W)
        return kmers, emit

    # ---- correctness of the mxu variant vs the XLA front ----
    km_p, em_p = (np.asarray(x) for x in run_mxu_planes(pa, pb, za, zb))
    km_x, em_x = (np.asarray(x) for x in xla_front(sw))
    km_mine = km_p.T.reshape(-1)
    em_mine = em_p.T.reshape(-1).astype(bool)
    km_ref = km_x.T.reshape(-1)
    em_ref = em_x.T.reshape(-1)
    ok = (np.array_equal(em_mine, em_ref)
          and np.array_equal(km_mine[em_mine], km_ref[em_ref]))
    print(f"mxu planes: {'MATCH' if ok else 'DIFF!'} "
          f"({int(em_mine.sum())} emits)", file=sys.stderr)
    if not ok:
        bad = np.flatnonzero(em_mine != em_ref)[:5]
        print(f"first emit diffs at {bad}", file=sys.stderr)

    def timeit(fn, *args):
        r = fn(*args)
        jax.block_until_ready(r)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                r = fn(*args)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / 8
            best = dt if best is None else min(best, dt)
        return best

    for name, fn in (("nohash", run_nohash), ("mul16", run_mul16),
                     ("mxu", run_mxu), ("mxu planes", run_mxu_planes)):
        dt = timeit(fn, pa, pb, za, zb)
        print(f"{name:11s}: {dt*1e3:7.2f} ms/step  {C/dt/1e6:8.0f} Mpos/s")


if __name__ == "__main__":
    main()
