"""SUPERSEDED MEASUREMENT METHODOLOGY — this probe times repeated
identical dispatches with block_until_ready, which the axon tunnel
pipelines/memoizes (and block does not truly sync): its ms numbers are
NOT trustworthy.  Kept for the kernel-correctness checks only; use
scripts/probe_chain_time.py (chained slope, salted calls) for timing.

Decomposition probe for the Pallas mul16 front: where do its ~3.1 ms go?

probe_front_mxu measured the full plane-writing front at 3.14 ms/2^24 with
a multiply bill of only 0.06 ms (mul16 - nohash) — yet the intrinsic cost
is ~0.1 ms IO + ~0.3 ms VPU.  This probe isolates the structural suspects
by ablating one piece at a time (identical (16, MJ) tile structure):

  full   : mul16 front, write (kmer u32, emit i8) planes  — the baseline.
  noin   : same compute, but streams are derived IN-KERNEL from iota
           (no input DMA / no (1, MJ) sublane-padded input blocks).
  noout  : same compute + input path, but the only output is an (8, 128)
           f32 accumulator (sum over km + emit per step, accumulated
           across sequential grid steps) — no plane stores.
  kmonly : write just the u32 kmer plane.
  emonly : write just the i8 emit plane.

Usage: python scripts/probe_pallas_parts.py [C_log2] [MJ] [variants]
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
from modimizer_tpu.ops.packed import derive_tw, pack_sw

K, W, SEED = 16, 16, 17
C_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 24
MJ = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
VARIANTS = (sys.argv[3].split(",") if len(sys.argv) > 3
            else ["full", "noin", "noout", "kmonly", "emonly"])


def make_streams(sw, NJ):
    tw = derive_tw(sw)
    hi = (sw >> jnp.uint64(32)).astype(jnp.uint32)
    lo = sw.astype(jnp.uint32)
    P = jnp.stack([hi, lo], axis=1).reshape(-1)
    thi = (tw >> jnp.uint64(32)).astype(jnp.uint32)
    tlo = tw.astype(jnp.uint32)
    Z = jnp.stack([tlo, thi], axis=1).reshape(-1)
    return P[:NJ], P[1:NJ + 1], Z[:NJ], Z[1:NJ + 1]


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


def front16(pa, pb, za, zb, factor1, w):
    """(16, MJ) rows from (1, MJ)-broadcast streams."""
    s2 = jax.lax.broadcasted_iota(jnp.uint32, (16, MJ), 0) * jnp.uint32(2)
    inv = jnp.uint32(32) - s2
    zero = s2 == jnp.uint32(0)
    kf = jnp.where(zero, pa, (pa << s2) | (pb >> inv))
    kr = jnp.where(zero, za, (za >> s2) | (zb << inv))
    hf = hash32_hi_mul16(kf, factor1)
    hr = hash32_hi_mul16(kr, factor1)
    isF = hf < hr
    h = jnp.where(isF, hf, hr)
    emit = (h & jnp.uint32(w - 1)) == jnp.uint32(0)
    km = jnp.where(isF, kf, kr)
    return km, emit


def bc(ref):
    return jnp.broadcast_to(ref[0:1, :], (16, MJ))


def kern_full(pa_ref, pb_ref, za_ref, zb_ref, km_ref, em_ref, *, factor1, w):
    km, emit = front16(bc(pa_ref), bc(pb_ref), bc(za_ref), bc(zb_ref),
                       factor1, w)
    km_ref[...] = km
    em_ref[...] = emit.astype(jnp.int8)


def kern_kmonly(pa_ref, pb_ref, za_ref, zb_ref, km_ref, *, factor1, w):
    km, emit = front16(bc(pa_ref), bc(pb_ref), bc(za_ref), bc(zb_ref),
                       factor1, w)
    km_ref[...] = jnp.where(emit, km, ~km)


def kern_emonly(pa_ref, pb_ref, za_ref, zb_ref, em_ref, *, factor1, w):
    km, emit = front16(bc(pa_ref), bc(pb_ref), bc(za_ref), bc(zb_ref),
                       factor1, w)
    em_ref[...] = (emit & (km != jnp.uint32(0))).astype(jnp.int8)


def kern_noin(sd_ref, km_ref, em_ref, *, factor1, w):
    g = pl.program_id(0)
    seed = sd_ref[0, 0] + g
    base = jax.lax.broadcasted_iota(jnp.uint32, (1, MJ), 1) + \
        jnp.uint32(seed).astype(jnp.uint32) * jnp.uint32(2654435761)
    pa = jnp.broadcast_to(base * jnp.uint32(0x9E3779B9), (16, MJ))
    pb = jnp.broadcast_to(base * jnp.uint32(0x85EBCA6B), (16, MJ))
    za = jnp.broadcast_to(base * jnp.uint32(0xC2B2AE35), (16, MJ))
    zb = jnp.broadcast_to(base * jnp.uint32(0x27D4EB2F), (16, MJ))
    km, emit = front16(pa, pb, za, zb, factor1, w)
    km_ref[...] = km
    em_ref[...] = emit.astype(jnp.int8)


def kern_noout(pa_ref, pb_ref, za_ref, zb_ref, acc_ref, *, factor1, w):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc_ref[...] = jnp.zeros((8, 128), jnp.float32)

    km, emit = front16(bc(pa_ref), bc(pb_ref), bc(za_ref), bc(zb_ref),
                       factor1, w)
    # fold km into a per-lane partial so nothing is dead; f32 reduce adds
    # are supported (integer full-reduces are not, see probe_pallas_front)
    v = (km & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32) \
        + emit.astype(jnp.float32) * jnp.float32(65536.0)
    part = v.reshape(16, MJ // 128, 128).sum(axis=1)          # (16, 128)
    acc_ref[...] = acc_ref[...] + part[:8, :] + part[8:, :]


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    sh = Seqhash.create(K, W, SEED)
    C = 1 << C_LOG2
    NJ = C // 16
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, C + K - 1).astype(np.uint8)
    sw = jnp.asarray(pack_sw(codes, C // 32 + 2))

    @jax.jit
    def prep(sw):
        return make_streams(sw, NJ)

    pa, pb, za, zb = (x.reshape(1, NJ) for x in prep(sw))
    grid = (NJ // MJ,)
    in4 = [pl.BlockSpec((1, MJ), lambda g: (g * 0, g),
                        memory_space=pltpu.VMEM)] * 4
    km_spec = pl.BlockSpec((16, MJ), lambda g: (g * 0, g),
                           memory_space=pltpu.VMEM)
    km_shape = jax.ShapeDtypeStruct((16, NJ), jnp.uint32)
    em_shape = jax.ShapeDtypeStruct((16, NJ), jnp.int8)

    runners = {}

    @jax.jit
    def run_full(pa, pb, za, zb):
        kern = functools.partial(kern_full, factor1=sh.factor1, w=W)
        return pl.pallas_call(kern, grid=grid, in_specs=in4,
                              out_specs=(km_spec, km_spec),
                              out_shape=(km_shape, em_shape))(pa, pb, za, zb)
    runners["full"] = lambda: run_full(pa, pb, za, zb)

    @jax.jit
    def run_kmonly(pa, pb, za, zb):
        kern = functools.partial(kern_kmonly, factor1=sh.factor1, w=W)
        return pl.pallas_call(kern, grid=grid, in_specs=in4,
                              out_specs=km_spec,
                              out_shape=km_shape)(pa, pb, za, zb)
    runners["kmonly"] = lambda: run_kmonly(pa, pb, za, zb)

    @jax.jit
    def run_emonly(pa, pb, za, zb):
        kern = functools.partial(kern_emonly, factor1=sh.factor1, w=W)
        return pl.pallas_call(kern, grid=grid, in_specs=in4,
                              out_specs=km_spec,
                              out_shape=em_shape)(pa, pb, za, zb)
    runners["emonly"] = lambda: run_emonly(pa, pb, za, zb)

    @jax.jit
    def run_noin(seed):
        kern = functools.partial(kern_noin, factor1=sh.factor1, w=W)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec((1, 1), lambda g: (g * 0, g * 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=(km_spec, km_spec),
            out_shape=(km_shape, em_shape))(seed)
    seed0 = jnp.zeros((1, 1), jnp.int32)
    runners["noin"] = lambda: run_noin(seed0)

    @jax.jit
    def run_noout(pa, pb, za, zb):
        kern = functools.partial(kern_noout, factor1=sh.factor1, w=W)
        return pl.pallas_call(
            kern, grid=grid, in_specs=in4,
            out_specs=pl.BlockSpec((8, 128), lambda g: (g * 0, g * 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(pa, pb, za, zb)
    runners["noout"] = lambda: run_noout(pa, pb, za, zb)

    def timeit(fn):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        print(f"  (compile+first {time.perf_counter()-t0:.1f}s)",
              file=sys.stderr, flush=True)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                r = fn()
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / 8
            best = dt if best is None else min(best, dt)
        return best, r

    for name in VARIANTS:
        dt, r = timeit(runners[name])
        print(f"{name:8s}: {dt*1e3:7.2f} ms/step  {C/dt/1e6:8.0f} Mpos/s",
              flush=True)
        if name == "noout":
            tot = float(np.asarray(r).sum())
            emits = round((tot - (tot % 65536.0)) / 65536.0)  # approx split
            print(f"  acc sum = {tot:.0f}", file=sys.stderr)


if __name__ == "__main__":
    main()
