"""Trustworthy chip timing: dependency-chained steps + slope extraction.

Round-5 discovery: repeating the SAME dispatch and blocking on the last
result is NOT a valid measurement through the axon tunnel — identical
executions pipeline (and can apparently short-circuit entirely: plane-
writing kernels "measured" 0.02 ms/2^24, i.e. 4 TB/s of HBM writes), and a
single blocked dispatch pays a ~20 ms round trip.  This harness measures
the way bench.py's chip rate does, then removes the round trip:

  - each measured program runs S dependency-chained steps under lax.scan
    (step i's input is perturbed by step i-1's checksum, so no caching /
    reordering is possible and all work really executes);
  - per-step time = (wall(S2) - wall(S1)) / (S2 - S1)  — the tunnel round
    trip and one-time program overheads cancel in the slope.

Variants:
  front      : Pallas mul16 front writing (kmer u32, emit i8) planes.
  nohash     : same minus the hash multiplies (trivial emit rule).
  fusedc     : the shipped XLA scan+compact step (_scan_compact_local).
  fusedc_pm  : fusedc with posmajor=True (stream-order blocks).
  front_xla  : the XLA u32 front materializing (kmer, emit) planes.

Usage: python scripts/probe_chain_time.py [C_log2] [S1] [S2] [variants]
Defaults: C=2^24, S1=4, S2=12.
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
from modimizer_tpu.ops.packed import derive_tw, mod_is_zero, pack_bits, \
    pack_sw
from modimizer_tpu.ops.seqhash import scan_bo
from modimizer_tpu.parallel.sharded import _scan_compact_local, \
    _scan_front_u32

K, W, SEED = 16, 16, 17
import os as _os
K = int(_os.environ.get("MODIMIZER_BENCH_K", K))
W = int(_os.environ.get("MODIMIZER_BENCH_W", W))
C_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 24
S1 = int(sys.argv[2]) if len(sys.argv) > 2 else 4
S2 = int(sys.argv[3]) if len(sys.argv) > 3 else 12
VARIANTS = (sys.argv[4].split(",") if len(sys.argv) > 4
            else ["front", "nohash", "front_xla", "fusedc"])
MJ = int(__import__("os").environ.get("MODIMIZER_PROBE_MJ", "4096"))


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


def front16(pa, pb, za, zb, factor1, w, hashed=True):
    MJx = pa.shape[1]
    s2 = jax.lax.broadcasted_iota(jnp.uint32, (16, MJx), 0) * jnp.uint32(2)
    inv = jnp.uint32(32) - s2
    zero = s2 == jnp.uint32(0)
    kf = jnp.where(zero, pa, (pa << s2) | (pb >> inv))
    kr = jnp.where(zero, za, (za >> s2) | (zb << inv))
    if not hashed:
        emit = ((kf ^ kr) & jnp.uint32(15)) == jnp.uint32(0)
        return jnp.where(emit, kf, kr), emit
    hf = hash32_hi_mul16(kf, factor1)
    hr = hash32_hi_mul16(kr, factor1)
    isF = hf < hr
    h = jnp.where(isF, hf, hr)
    emit = (h & jnp.uint32(w - 1)) == jnp.uint32(0)
    return jnp.where(isF, kf, kr), emit


def bc16(ref, MJx):
    return jnp.broadcast_to(ref[0:1, :], (16, MJx))


def kern_front(pa_ref, pb_ref, za_ref, zb_ref, km_ref, em_ref, *,
               factor1, w, hashed):
    km, emit = front16(bc16(pa_ref, MJ), bc16(pb_ref, MJ),
                       bc16(za_ref, MJ), bc16(zb_ref, MJ),
                       factor1, w, hashed)
    km_ref[...] = km
    em_ref[...] = emit.astype(jnp.int8)


def main():
    print(f"devices: {jax.devices()}  C=2^{C_LOG2} S1={S1} S2={S2} MJ={MJ}",
          file=sys.stderr)
    sh = Seqhash.create(K, W, SEED)
    C = 1 << C_LOG2
    NJ = C // 16
    bo = scan_bo(W)
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, C + K - 1).astype(np.uint8)
    sw_d = jnp.asarray(pack_sw(codes, C // 32 + 2))
    vb_d = jnp.asarray(pack_bits(np.ones(C, bool), C // 64))

    def make_streams(sw):
        tw = derive_tw(sw)
        hi = (sw >> jnp.uint64(32)).astype(jnp.uint32)
        lo = sw.astype(jnp.uint32)
        P = jnp.stack([hi, lo], axis=1).reshape(-1)
        thi = (tw >> jnp.uint64(32)).astype(jnp.uint32)
        tlo = tw.astype(jnp.uint32)
        Z = jnp.stack([tlo, thi], axis=1).reshape(-1)
        return (P[:NJ].reshape(1, NJ), P[1:NJ + 1].reshape(1, NJ),
                Z[:NJ].reshape(1, NJ), Z[1:NJ + 1].reshape(1, NJ))

    in4 = [pl.BlockSpec((1, MJ), lambda g: (g * 0, g),
                        memory_space=pltpu.VMEM)] * 4
    km_spec = pl.BlockSpec((16, MJ), lambda g: (g * 0, g),
                           memory_space=pltpu.VMEM)
    km_shape = jax.ShapeDtypeStruct((16, NJ), jnp.uint32)
    em_shape = jax.ShapeDtypeStruct((16, NJ), jnp.int8)

    def front_step(sw, hashed):
        pa, pb, za, zb = make_streams(sw)
        kern = functools.partial(kern_front, factor1=sh.factor1, w=W,
                                 hashed=hashed)
        km, em = pl.pallas_call(kern, grid=(NJ // MJ,), in_specs=in4,
                                out_specs=(km_spec, km_spec),
                                out_shape=(km_shape, em_shape))(pa, pb,
                                                                za, zb)
        # full-plane checksum: every output element feeds the carry, so
        # no call/iteration can be elided anywhere in the stack
        chk = (jnp.sum(km.astype(jnp.uint32))
               + jnp.sum(em.astype(jnp.uint32)))
        return chk.astype(jnp.uint32)

    def front_xla_step(sw):
        hashes, kmers, pos, isF = _scan_front_u32(sw, k=K,
                                                  factor1=sh.factor1, C=C)
        emit = mod_is_zero(hashes, W)
        kmers, emit = jax.lax.optimization_barrier((kmers, emit))
        return (jnp.sum(kmers.astype(jnp.uint32))
                + jnp.sum(emit.astype(jnp.uint32))
                ).astype(jnp.uint32).reshape(())

    def front_xla64_step(sw):
        from modimizer_tpu.parallel.sharded import _scan_front
        hashes, kmers, pos, isF = _scan_front(sw, k=K, factor1=sh.factor1,
                                              C=C)
        emit = mod_is_zero(hashes, W)
        kmers, emit = jax.lax.optimization_barrier((kmers, emit))
        return (jnp.sum(kmers.astype(jnp.uint32))
                + jnp.sum(emit.astype(jnp.uint32))
                ).astype(jnp.uint32).reshape(())

    def front_b32(sw):
        """u32 phase-major front, broadcast formulation: rows from
        [1, NW] sublane broadcasts + iota-driven variable shifts instead
        of a 32-row stacked python loop."""
        from modimizer_tpu.ops.packed import derive_tw as _dtw
        NWl = C // 32
        tw = _dtw(sw)
        sA = (sw >> jnp.uint64(32)).astype(jnp.uint32)
        sB = sw.astype(jnp.uint32)
        tA = (tw >> jnp.uint64(32)).astype(jnp.uint32)
        tB = tw.astype(jnp.uint32)
        A0 = sA[:NWl][None, :]
        B0 = sB[:NWl][None, :]
        A1 = sA[1:NWl + 1][None, :]
        At0 = tA[:NWl][None, :]
        Bt0 = tB[:NWl][None, :]
        Bt1 = tB[1:NWl + 1][None, :]
        r = jax.lax.broadcasted_iota(jnp.uint32, (32, NWl), 0)
        r2 = r * jnp.uint32(2)
        lo = r < jnp.uint32(16)
        # shift counts clamped into [0, 31] on the dead branch
        sh_a = jnp.where(lo, r2, r2 - jnp.uint32(32))
        sh_b = jnp.where(lo, jnp.uint32(32) - r2,
                         jnp.uint32(64) - r2) & jnp.uint32(31)
        h32 = jnp.where(lo,
                        (A0 << sh_a) | jnp.where(r == jnp.uint32(0),
                                                 jnp.uint32(0), B0 >> sh_b),
                        (B0 << sh_a) | jnp.where(r == jnp.uint32(16),
                                                 jnp.uint32(0), A1 >> sh_b))
        t32 = jnp.where(lo,
                        (Bt0 >> sh_a) | jnp.where(r == jnp.uint32(0),
                                                  jnp.uint32(0),
                                                  At0 << sh_b),
                        (At0 >> sh_a) | jnp.where(r == jnp.uint32(16),
                                                  jnp.uint32(0),
                                                  Bt1 << sh_b))
        from modimizer_tpu.parallel.sharded import _hash32_hi
        hf = _hash32_hi(h32, sh.factor1)
        hr = _hash32_hi(t32, sh.factor1)
        isF = hf < hr
        hashes = jnp.where(isF, hf, hr)
        kmers = jnp.where(isF, h32, t32)
        return hashes, kmers, isF

    def front_b32_step(sw):
        hashes, kmers, isF = front_b32(sw)
        emit = mod_is_zero(hashes, W)
        kmers, emit = jax.lax.optimization_barrier((kmers, emit))
        return (jnp.sum(kmers.astype(jnp.uint32))
                + jnp.sum(emit.astype(jnp.uint32))).astype(
                    jnp.uint32).reshape(())

    def fusedd_b32_step(sw):
        from modimizer_tpu.parallel.sharded import BLK as _BLK, \
            _fused_compact_tail
        nb = C // _BLK
        ipb = (C // 32) // _BLK
        hashes, kmers, isF = front_b32(sw)
        v32 = jax.lax.bitcast_convert_type(vb_d, jnp.uint32).reshape(
            C // 32)
        rr = jax.lax.broadcasted_iota(jnp.uint32, (32, C // 32), 0)
        validm = ((v32[None, :] >> rr) & jnp.uint32(1)).astype(jnp.bool_)
        emit = validm & mod_is_zero(hashes, W)
        km2 = kmers.reshape(nb, _BLK)
        e2 = emit.reshape(nb, _BLK)
        if _os.environ.get("MODIMIZER_FUSED_STAGE", "1") != "0":
            km2, e2 = jax.lax.optimization_barrier((km2, e2))
        lpos = jax.lax.broadcasted_iota(jnp.uint32, (nb, _BLK), 1) \
            * jnp.uint32(32)
        brow = jax.lax.broadcasted_iota(jnp.uint32, (nb, 1), 0)
        base = ((brow % jnp.uint32(ipb)) * jnp.uint32(32 * _BLK)
                + brow // jnp.uint32(ipb))
        ok, op, n, ov = _fused_compact_tail(km2, lpos, e2, base, bo=bo)
        return (n.astype(jnp.uint32)
                + jnp.sum(ok.astype(jnp.uint32)).astype(jnp.uint32)
                + jnp.sum(op).astype(jnp.uint32)).astype(jnp.uint32)

    def be_step(sw, backend, posmajor):
        from modimizer_tpu.parallel.sharded import _scan_compact_core, \
            _expand_valid
        ok, op, n, ov = _scan_compact_core(
            sw, _expand_valid(vb_d, C), k=K, w=W, factor1=sh.factor1, C=C,
            bo=bo, backend=backend, posmajor=posmajor, vbits=vb_d)
        return (n.astype(jnp.uint32)
                + jnp.sum(ok.astype(jnp.uint32)).astype(jnp.uint32)
                + jnp.sum(op).astype(jnp.uint32)).astype(jnp.uint32)

    def chained(step_fn, S):
        @jax.jit
        def run(sw0, salt):
            def body(carry, _):
                sw, acc = carry
                a64 = acc.astype(jnp.uint64)
                swx = sw.at[0].set(sw[0] ^ ((a64 << jnp.uint64(32)) | a64))
                chk = step_fn(swx)
                return (sw, chk), chk
            (_, last), chks = jax.lax.scan(
                body, (sw0, salt.astype(jnp.uint32)), None, length=S)
            return jnp.sum(chks)
        return run

    steps = {
        "front": lambda sw: front_step(sw, True),
        "nohash": lambda sw: front_step(sw, False),
        "front_xla": front_xla_step,
        "fusedc": lambda sw: be_step(sw, "fusedc", False),
        "fusedc_pm": lambda sw: be_step(sw, "fusedc", True),
        "fusedd": lambda sw: be_step(sw, "fusedd", False),
        "fusedd_pm": lambda sw: be_step(sw, "fusedd", True),
        "onehot_i8": lambda sw: be_step(sw, "onehot_i8", False),
        "twolevel_i8": lambda sw: be_step(sw, "twolevel_i8", False),
        "front_b32": front_b32_step,
        "front_xla64": front_xla64_step,
        "fusedd_b32": fusedd_b32_step,
    }

    for name in VARIANTS:
        fn = steps[name]
        walls = {}
        for S in (S1, S2):
            run = chained(fn, S)
            t0 = time.perf_counter()
            r = int(np.asarray(run(sw_d, jnp.uint32(12345))))
            compile_s = time.perf_counter() - t0
            best = None
            for rep in range(3):
                # fresh salt per call (the remote backend memoizes
                # identical (executable, args) executions), and time to a
                # forced SCALAR FETCH — block_until_ready on this remote
                # backend can return before execution completes
                t0 = time.perf_counter()
                r = int(np.asarray(run(sw_d, jnp.uint32(rep))))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            walls[S] = best
            print(f"  {name} S={S}: wall {best*1e3:.2f} ms "
                  f"(compile {compile_s:.1f}s, chk {r})",
                  file=sys.stderr, flush=True)
        step_ms = (walls[S2] - walls[S1]) / (S2 - S1) * 1e3
        print(f"{name:10s}: {step_ms:7.2f} ms/step  "
              f"{C/(step_ms*1e-3)/1e6:8.0f} Mpos/s  "
              f"(walls {walls[S1]*1e3:.1f}/{walls[S2]*1e3:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
