"""SUPERSEDED MEASUREMENT METHODOLOGY — this probe times repeated
identical dispatches with block_until_ready, which the axon tunnel
pipelines/memoizes (and block does not truly sync): its ms numbers are
NOT trustworthy.  Kept for the kernel-correctness checks only; use
scripts/probe_chain_time.py (chained slope, salted calls) for timing.

Probe: where does the scan front's time go, and can the MXU absorb the
hash multiplies?

All variants WRITE the (kmer, emit) planes — count-only kernels measured
impossibly fast on this toolchain (0.02 ms/2^24; the grid body is clearly
not executed per position), so only plane-writing kernels are trusted, and
every variant's planes are checked against _scan_front_u32.

  nohash : funnel + trivial emit (no multiplies) — the IO+funnel floor.
  mul16  : funnel + both-strand hash via 16-bit decomposed mulhi32 (the
           round-4 Pallas front).  mul16 - nohash = the multiply bill.
  mxu    : hash partials as ONE tiny bf16 matmul per tile — hash32_hi(a)
           = low32(a*Fh) + mulhi32(a, Fl) is LINEAR in the byte limbs of
           a: W[s, i] = limb_{s-i}(F*), so W [24, 8] @ A [8, MJ] gives
           every partial sum exactly (products <= 255^2, f32 accumulate),
           and a short u32 carry chain rebuilds both strands' hashes.
           A is built broadcast+shift (no concatenate), W is padded to 24
           rows for sublane alignment.

Usage: python scripts/probe_front_mxu.py [C_log2] [MJ] [variants]
       variants = comma list of nohash,mul16,mxu (default all)
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
VARIANTS = (sys.argv[3].split(",") if len(sys.argv) > 3
            else ["nohash", "mul16", "mxu"])


def make_streams(sw):
    tw = derive_tw(sw)
    hi = (sw >> jnp.uint64(32)).astype(jnp.uint32)
    lo = sw.astype(jnp.uint32)
    P = jnp.stack([hi, lo], axis=1).reshape(-1)
    thi = (tw >> jnp.uint64(32)).astype(jnp.uint32)
    tlo = tw.astype(jnp.uint32)
    Z = jnp.stack([tlo, thi], axis=1).reshape(-1)
    return P, Z


def funnel16(pa_ref, pb_ref, za_ref, zb_ref):
    pa = jnp.broadcast_to(pa_ref[0:1, :], (16, MJ))
    pb = jnp.broadcast_to(pb_ref[0:1, :], (16, MJ))
    za = jnp.broadcast_to(za_ref[0:1, :], (16, MJ))
    zb = jnp.broadcast_to(zb_ref[0:1, :], (16, MJ))
    s2 = jax.lax.broadcasted_iota(jnp.uint32, (16, MJ), 0) * jnp.uint32(2)
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


def make_W(factor1):
    """[24, 8] f32: rows 0..10 = strand-f partials, 11..21 = strand-r,
    22..23 zero padding; cols = 4 kf limbs then 4 kr limbs."""
    bl = [(factor1 >> (8 * j)) & 0xFF for j in range(4)]
    bh = [(factor1 >> (32 + 8 * j)) & 0xFF for j in range(4)]
    W1 = np.zeros((11, 4), np.float32)
    for s in range(7):
        for i in range(4):
            if 0 <= s - i < 4:
                W1[s, i] = bl[s - i]
    for s in range(4):
        for i in range(4):
            if 0 <= s - i < 4:
                W1[7 + s, i] = bh[s - i]
    Wf = np.zeros((24, 8), np.float32)
    Wf[:11, :4] = W1
    Wf[11:22, 4:] = W1
    return Wf


def carries(p):
    c01 = p[0] + (p[1] << jnp.uint32(8))
    c23 = p[2] + (p[3] << jnp.uint32(8))
    mid = (c01 >> jnp.uint32(16)) + c23
    hi = ((mid >> jnp.uint32(16)) + p[4] + (p[5] << jnp.uint32(8))
          + (p[6] << jnp.uint32(16)))
    lo = (p[7] + (p[8] << jnp.uint32(8)) + (p[9] << jnp.uint32(16))
          + (p[10] << jnp.uint32(24)))
    return hi + lo


def kern_nohash(pa_ref, pb_ref, za_ref, zb_ref, km_ref, em_ref):
    kf, kr = funnel16(pa_ref, pb_ref, za_ref, zb_ref)
    emit = ((kf ^ kr) & jnp.uint32(15)) == jnp.uint32(0)
    km_ref[...] = jnp.where(emit, kf, kr)
    em_ref[...] = emit.astype(jnp.int8)


def kern_mul16(pa_ref, pb_ref, za_ref, zb_ref, km_ref, em_ref, *,
               factor1, w):
    kf, kr = funnel16(pa_ref, pb_ref, za_ref, zb_ref)
    hf = hash32_hi_mul16(kf, factor1)
    hr = hash32_hi_mul16(kr, factor1)
    isF = hf < hr
    h = jnp.where(isF, hf, hr)
    emit = (h & jnp.uint32(w - 1)) == jnp.uint32(0)
    km_ref[...] = jnp.where(isF, kf, kr)
    em_ref[...] = emit.astype(jnp.int8)


def kern_mxu(pa_ref, pb_ref, za_ref, zb_ref, w_ref, km_ref, em_ref, *, w):
    """One phase row per grid step (grid = 16 x blocks): uniform funnel
    shift, limb planes by broadcast+shift, one [24,8]@[8,MJ] bf16 dot."""
    s2 = (pl.program_id(0) % 16).astype(jnp.uint32) * jnp.uint32(2)
    pa = pa_ref[0:1, :]
    pb = pb_ref[0:1, :]
    za = za_ref[0:1, :]
    zb = zb_ref[0:1, :]
    zero = s2 == jnp.uint32(0)
    inv = jnp.uint32(32) - s2
    kf = jnp.where(zero, pa, (pa << s2) | (pb >> inv))
    kr = jnp.where(zero, za, (za >> s2) | (zb << inv))
    # limb planes [8, MJ]: rows 0-3 = kf limbs, 4-7 = kr limbs
    row = jax.lax.broadcasted_iota(jnp.uint32, (8, MJ), 0)
    kk = jnp.where(row < jnp.uint32(4),
                   jnp.broadcast_to(kf, (8, MJ)),
                   jnp.broadcast_to(kr, (8, MJ)))
    lsh = (row & jnp.uint32(3)) * jnp.uint32(8)
    A = ((kk >> lsh) & jnp.uint32(0xFF)).astype(jnp.int32).astype(
        jnp.bfloat16)
    P = jax.lax.dot_general(w_ref[...], A, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [24, MJ]
    pr = [P[i:i + 1, :].astype(jnp.int32).astype(jnp.uint32)
          for i in range(22)]
    hf = carries(pr[:11])
    hr = carries(pr[11:])
    isF = hf < hr
    h = jnp.where(isF, hf, hr)
    emit = (h & jnp.uint32(w - 1)) == jnp.uint32(0)
    km_ref[...] = jnp.where(isF, kf, kr)
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

    out_shape = (jax.ShapeDtypeStruct((16, NJ), jnp.uint32),
                 jax.ShapeDtypeStruct((16, NJ), jnp.int8))

    def pcall16(kern_fn):
        return pl.pallas_call(
            kern_fn,
            grid=(NJ // MJ,),
            in_specs=[pl.BlockSpec((1, MJ), lambda g: (g * 0, g),
                                   memory_space=pltpu.VMEM)] * 4,
            out_specs=(pl.BlockSpec((16, MJ), lambda g: (g * 0, g),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((16, MJ), lambda g: (g * 0, g),
                                    memory_space=pltpu.VMEM)),
            out_shape=out_shape)

    def pcall_phase(kern_fn):
        return pl.pallas_call(
            kern_fn,
            grid=(16, NJ // MJ),
            in_specs=[pl.BlockSpec((1, MJ), lambda s, g: (g * 0, g),
                                   memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec((24, 8), lambda s, g: (0, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((1, MJ), lambda s, g: (s, g),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, MJ), lambda s, g: (s, g),
                                    memory_space=pltpu.VMEM)),
            out_shape=out_shape)

    @jax.jit
    def run_nohash(pa, pb, za, zb):
        return pcall16(kern_nohash)(
            pa.reshape(1, NJ), pb.reshape(1, NJ),
            za.reshape(1, NJ), zb.reshape(1, NJ))

    @jax.jit
    def run_mul16(pa, pb, za, zb):
        kern = functools.partial(kern_mul16, factor1=sh.factor1, w=W)
        return pcall16(kern)(
            pa.reshape(1, NJ), pb.reshape(1, NJ),
            za.reshape(1, NJ), zb.reshape(1, NJ))

    @jax.jit
    def run_mxu(pa, pb, za, zb):
        kern = functools.partial(kern_mxu, w=W)
        return pcall_phase(kern)(
            pa.reshape(1, NJ), pb.reshape(1, NJ),
            za.reshape(1, NJ), zb.reshape(1, NJ), Wmat)

    @jax.jit
    def xla_front(sw):
        hashes, kmers, pos, isF = _scan_front_u32(sw, k=K,
                                                  factor1=sh.factor1, C=C)
        emit = mod_is_zero(hashes, W)
        return kmers, emit

    km_x, em_x = (np.asarray(x) for x in xla_front(sw))
    km_ref = km_x.T.reshape(-1)
    em_ref = em_x.T.reshape(-1)

    def check(name, km_p, em_p):
        km_mine = np.asarray(km_p).T.reshape(-1)
        em_mine = np.asarray(em_p).T.reshape(-1).astype(bool)
        ok = (np.array_equal(em_mine, em_ref)
              and np.array_equal(km_mine[em_mine], km_ref[em_ref]))
        print(f"{name} planes: {'MATCH' if ok else 'DIFF!'} "
              f"({int(em_mine.sum())} emits)", flush=True)
        if not ok:
            bad = np.flatnonzero(em_mine != em_ref)[:5]
            print(f"  first emit diffs at {bad}", file=sys.stderr)

    def timeit(fn, *args):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        print(f"  (compile+first {time.perf_counter()-t0:.1f}s)",
              file=sys.stderr, flush=True)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                r = fn(*args)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / 8
            best = dt if best is None else min(best, dt)
        return best, r

    runners = {"nohash": run_nohash, "mul16": run_mul16, "mxu": run_mxu}
    for name in VARIANTS:
        dt, r = timeit(runners[name], pa, pb, za, zb)
        print(f"{name:8s}: {dt*1e3:7.2f} ms/step  {C/dt/1e6:8.0f} Mpos/s",
              flush=True)
        if name != "nohash":   # nohash's emit rule differs by design
            check(name, *r)


if __name__ == "__main__":
    main()
