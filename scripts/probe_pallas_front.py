"""Probe: can a Pallas kernel beat XLA's scan front on this Mosaic toolchain?

Computes the u32 scan front (k <= 16) — funnel extraction of both strands,
canonical hash, modimizer emit test — with NO per-phase unrolling: the 16
phases ride the SUBLANE axis and the funnel shift amount is a broadcasted
iota (VPU variable shifts), so the kernel body is pure elementwise u32 ops
on [16, MJ] tiles.

Mosaic quirks found here (drive the real kernel's design):
  - integer full-reduces are unsupported under jax_enable_x64 (the
    lowering inserts an i64 convert); f32 reduces work and counts < 2^24
    are exact;
  - uint32 -> float32 casts are unsupported (route via int32);
  - reductions over unsigned ints are unsupported generally.

Correctness: full (kmer, emit) planes vs _scan_front_u32 at small C.
Timing: f32 emit-count reduce only at C=2^24.

Usage: python scripts/probe_pallas_front.py [C_log2] [MJ]
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
    """u32 stream views: fwd kmer(16j+s) = P[j]<<2s | P[j+1]>>(32-2s);
    rc kmer(16j+s) = Z[j]>>2s | Z[j+1]<<(32-2s)."""
    tw = derive_tw(sw)
    hi = (sw >> jnp.uint64(32)).astype(jnp.uint32)
    lo = sw.astype(jnp.uint32)
    P = jnp.stack([hi, lo], axis=1).reshape(-1)          # big-endian pairs
    thi = (tw >> jnp.uint64(32)).astype(jnp.uint32)
    tlo = tw.astype(jnp.uint32)
    Z = jnp.stack([tlo, thi], axis=1).reshape(-1)        # pair-swapped
    return P, Z


def front_math(pa, pb, za, zb, *, factor1, w, shape):
    s2 = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) * jnp.uint32(2)
    inv = jnp.uint32(32) - s2
    zero = s2 == jnp.uint32(0)
    kf = jnp.where(zero, pa, (pa << s2) | (pb >> inv))
    kr = jnp.where(zero, za, (za >> s2) | (zb << inv))

    def hash32_hi(a):
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

    hf = hash32_hi(kf)
    hr = hash32_hi(kr)
    isF = hf < hr
    h = jnp.where(isF, hf, hr)
    km = jnp.where(isF, kf, kr)
    emit = (h & jnp.uint32(w - 1)) == jnp.uint32(0)
    return km, emit


def timing_kernel(pa_ref, pb_ref, za_ref, zb_ref, out_ref, *, factor1, w):
    pa = jnp.broadcast_to(pa_ref[0:1, :], (16, MJ))
    pb = jnp.broadcast_to(pb_ref[0:1, :], (16, MJ))
    za = jnp.broadcast_to(za_ref[0:1, :], (16, MJ))
    zb = jnp.broadcast_to(zb_ref[0:1, :], (16, MJ))
    km, emit = front_math(pa, pb, za, zb, factor1=factor1, w=w,
                          shape=(16, MJ))
    n = jnp.sum(emit.astype(jnp.int32).astype(jnp.float32))

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0)

    out_ref[0, 0] += n


def plane_kernel(pa_ref, pb_ref, za_ref, zb_ref, km_ref, em_ref, *,
                 factor1, w):
    pa = jnp.broadcast_to(pa_ref[0:1, :], (16, MJ))
    pb = jnp.broadcast_to(pb_ref[0:1, :], (16, MJ))
    za = jnp.broadcast_to(za_ref[0:1, :], (16, MJ))
    zb = jnp.broadcast_to(zb_ref[0:1, :], (16, MJ))
    km, emit = front_math(pa, pb, za, zb, factor1=factor1, w=w,
                          shape=(16, MJ))
    km_ref[:, :] = km
    em_ref[:, :] = emit.astype(jnp.int8)


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
        P, Z = make_streams(sw)
        return P[:NJ], P[1:NJ + 1], Z[:NJ], Z[1:NJ + 1]

    def pcall(kern_fn, out_shape, out_specs):
        grid = NJ // MJ
        return pl.pallas_call(
            kern_fn,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, MJ), lambda g: (g * 0, g),
                                   memory_space=pltpu.VMEM)] * 4,
            out_specs=out_specs,
            out_shape=out_shape,
        )

    @jax.jit
    def pallas_count(pa, pb, za, zb):
        kern = functools.partial(timing_kernel, factor1=sh.factor1, w=W)
        return pcall(kern, jax.ShapeDtypeStruct((1, 1), jnp.float32),
                     pl.BlockSpec((1, 1), lambda g: (g * 0, g * 0),
                                  memory_space=pltpu.SMEM))(
            pa.reshape(1, NJ), pb.reshape(1, NJ),
            za.reshape(1, NJ), zb.reshape(1, NJ))

    @jax.jit
    def pallas_planes(pa, pb, za, zb):
        kern = functools.partial(plane_kernel, factor1=sh.factor1, w=W)
        return pcall(
            kern,
            (jax.ShapeDtypeStruct((16, NJ), jnp.uint32),
             jax.ShapeDtypeStruct((16, NJ), jnp.int8)),
            (pl.BlockSpec((16, MJ), lambda g: (g * 0, g),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((16, MJ), lambda g: (g * 0, g),
                          memory_space=pltpu.VMEM)))(
            pa.reshape(1, NJ), pb.reshape(1, NJ),
            za.reshape(1, NJ), zb.reshape(1, NJ))

    @jax.jit
    def xla_front(sw):
        hashes, kmers, pos, isF = _scan_front_u32(sw, k=K,
                                                  factor1=sh.factor1, C=C)
        emit = mod_is_zero(hashes, W)
        return kmers, emit

    pa, pb, za, zb = prep(sw)

    # ---- correctness: full planes vs the XLA front ----
    km_p, em_p = (np.asarray(x) for x in pallas_planes(pa, pb, za, zb))
    km_x, em_x = (np.asarray(x) for x in xla_front(sw))
    # mine: [16, NJ] pos=16j+s -> transpose-flatten = position order;
    # XLA:  [32, NW] pos=32i+r -> same
    km_mine = km_p.T.reshape(-1)
    em_mine = em_p.T.reshape(-1).astype(bool)
    km_ref = km_x.T.reshape(-1)
    em_ref = em_x.T.reshape(-1)
    ok = (np.array_equal(em_mine, em_ref)
          and np.array_equal(km_mine[em_mine], km_ref[em_ref]))
    print(f"planes: {'MATCH' if ok else 'DIFF!'} "
          f"({int(em_mine.sum())} emits)", file=sys.stderr)
    if not ok:
        bad = np.flatnonzero(em_mine != em_ref)[:5]
        print(f"first emit diffs at {bad}", file=sys.stderr)
        badk = np.flatnonzero((km_mine != km_ref) & em_mine & em_ref)[:5]
        print(f"first kmer diffs at {badk}", file=sys.stderr)
        return

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

    dt = timeit(pallas_count, pa, pb, za, zb)
    print(f"pallas count : {dt*1e3:7.2f} ms/step  {C/dt/1e6:8.0f} Mpos/s "
          f"(MJ={MJ})")
    dt = timeit(pallas_planes, pa, pb, za, zb)
    print(f"pallas planes: {dt*1e3:7.2f} ms/step  {C/dt/1e6:8.0f} Mpos/s")
    dt = timeit(xla_front, sw)
    print(f"xla front32  : {dt*1e3:7.2f} ms/step  {C/dt/1e6:8.0f} Mpos/s "
          "(materializing planes)")


if __name__ == "__main__":
    main()
