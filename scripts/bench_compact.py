"""Ablation bench: scan+compact backends on one TPU chip.

Times the jitted scan step (packed 2-bit stream -> compacted modimizer
rows) per backend on device-resident data, cross-checking that every
backend returns bit-identical rows.  Drives the round-3 one-hot-cube
byte-reduction work (docs/PERF.md).

Usage: python scripts/bench_compact.py [C_log2] [backend ...]
Block size sweeps ride MODIMIZER_BLK (bo is re-derived per BLK via scan_bo).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import modimizer_tpu  # noqa: F401

import jax
import jax.numpy as jnp

from modimizer_tpu.core.seqhash import Seqhash
from modimizer_tpu.ops.packed import mod_is_zero, pack_bits, pack_sw
from modimizer_tpu.ops.seqhash import scan_bo
from modimizer_tpu.parallel.sharded import (BLK, _expand_valid, _scan_front,
                                            _scan_front_u32,
                                            _scan_compact_local)

K, W, SEED = 16, 16, 17
K = int(os.environ.get("MODIMIZER_BENCH_K", K))
W = int(os.environ.get("MODIMIZER_BENCH_W", W))  # e.g. 31 probes the
# non-pow2 (Lemire) device emit test — the reference's default divisor
C_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 24
BACKENDS = sys.argv[2:] or ["onehot", "onehot_i8", "twolevel_i8"]
BO = scan_bo(W)
REPS = 16
BATCHES = 3
SCAN_N = int(os.environ.get("MODIMIZER_SCANSTEPS", "1"))


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"BLK={BLK} bo={BO}", file=sys.stderr)
    sh = Seqhash.create(K, W, SEED)
    C = 1 << C_LOG2
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, C + K - 1).astype(np.uint8)
    sw_d = jnp.asarray(pack_sw(codes, C // 32 + 2))
    vb_d = jnp.asarray(pack_bits(np.ones(C, bool), C // 64))

    import functools

    @functools.partial(jax.jit, static_argnames=("u32",))
    def front_only(swx, vb, u32=False):
        """The scan front alone (funnel + both-strand hash + emit mask) —
        the step's floor; the gap to a full backend is the compaction
        cost.  Reduced to scalars so nothing big leaves the device."""
        fr = _scan_front_u32 if u32 else _scan_front
        hashes, kmers, pos, isF = fr(swx, k=K, factor1=sh.factor1, C=C)
        emit = _expand_valid(vb, C) & mod_is_zero(hashes, W)
        n = jnp.sum(emit).astype(jnp.int64)
        chk = jnp.sum(jnp.where(emit, kmers.astype(jnp.uint64),
                                jnp.uint64(0)))
        return n + chk.astype(jnp.int64)

    @jax.jit
    def front_b16(swx, vb):
        """The fused backend's bcast16 front alone ([16, 2, NW] layout +
        packed-bit validity), reduced the same way — fused minus this is
        the fused compaction cost."""
        from modimizer_tpu.parallel.sharded import _scan_front_bcast16
        NW = C // 32
        hashes, kmers, isF = _scan_front_bcast16(swx, k=K, factor1=sh.factor1,
                                                 C=C)
        v32 = jax.lax.bitcast_convert_type(vb, jnp.uint32).reshape(NW)
        bit = (jax.lax.broadcasted_iota(jnp.uint32, (16, 2, NW), 1)
               * jnp.uint32(16)
               + jax.lax.broadcasted_iota(jnp.uint32, (16, 2, NW), 0))
        emit = (((v32[None, None, :] >> bit) & jnp.uint32(1)).astype(
            jnp.bool_) & mod_is_zero(hashes, W))
        n = jnp.sum(emit).astype(jnp.int64)
        chk = jnp.sum(jnp.where(emit, kmers.astype(jnp.uint64),
                                jnp.uint64(0)))
        return n + chk.astype(jnp.int64)

    ref = None
    for be in BACKENDS:
        # "front"/"front32"/"frontb16" = front-only floors; "<backend>@u32"
        # runs a compaction backend over the u32 front (MODIMIZER_FRONT=u32)
        if be in ("front", "front32", "frontb16"):
            # front-only floors ride the same scan chain as the backends
            # under SCAN_N (they used to dispatch single programs while
            # ms/step divided by outer*SCAN_N — an 8x-flattering bug)
            def one_front(swx, be=be):
                if be == "frontb16":
                    return front_b16(swx, vb_d)
                return front_only(swx, vb_d, u32=(be == "front32"))

            if SCAN_N > 1:
                @jax.jit
                def fmulti(dep, one_front=one_front):
                    def body(carry, _):
                        swx = sw_d.at[0].set(
                            sw_d[0]
                            ^ (carry.astype(jnp.uint64) & jnp.uint64(1)))
                        return carry + one_front(swx), None
                    c, _ = jax.lax.scan(body, dep, None, length=SCAN_N)
                    return None, None, c, None

                def step(dep, fmulti=fmulti):
                    return fmulti(dep)
            else:
                def step(dep, one_front=one_front):
                    swx = sw_d.at[0].set(
                        sw_d[0] ^ (dep.astype(jnp.uint64) & jnp.uint64(1)))
                    return None, None, one_front(swx), None
        elif SCAN_N > 1:
            # MODIMIZER_SCANSTEPS=N: run N chained steps inside ONE jitted
            # lax.scan program — no per-program dispatch/launch gap, the
            # device-resident pipeline rate (what a double-buffered DMA
            # feed sustains on a real TPU host).  Outputs are consumed by
            # a checksum reduce so nothing is dead code.
            cbe, _, fr = be.partition("@")

            @jax.jit
            def multi(dep, cbe=cbe, fr=fr):
                def body(carry, _):
                    swx = sw_d.at[0].set(
                        sw_d[0] ^ (carry.astype(jnp.uint64) & jnp.uint64(1)))
                    ok, op, n, ov = _scan_compact_local(
                        swx, vb_d, k=K, w=W, factor1=sh.factor1, C=C, bo=BO,
                        backend=cbe, front=(fr or None))
                    chk = (n + jnp.sum(op.astype(jnp.uint64)).astype(jnp.int64)
                           + jnp.sum(ok).astype(jnp.int64))
                    return carry + chk, None
                c, _ = jax.lax.scan(body, dep, None, length=SCAN_N)
                return None, None, c, None

            def step(dep, multi=multi):
                return multi(dep)
        else:
            cbe, _, fr = be.partition("@")
            def step(dep, cbe=cbe, fr=fr):
                swx = sw_d.at[0].set(
                    sw_d[0] ^ (dep.astype(jnp.uint64) & jnp.uint64(1)))
                return _scan_compact_local(swx, vb_d, k=K, w=W,
                                           factor1=sh.factor1, C=C, bo=BO,
                                           backend=cbe,
                                           front=(fr or None))

        t0 = time.perf_counter()
        out = step(jnp.int64(0))
        n = int(np.asarray(out[2]))
        t_compile = time.perf_counter() - t0
        if be in ("front", "front32", "frontb16") or SCAN_N > 1:
            match = "n/a"
        else:
            host = tuple(np.asarray(x) for x in out[:2])
            if ref is None:
                ref = host
                match = "ref"
            elif be.startswith("fused"):
                # fused uses a different (legal) block partition at
                # posmajor=False: compare live rows as a multiset
                def rows(t):
                    lv = t[1] != 0xFFFFFFFF
                    a = np.stack([t[0][lv], t[1][lv].astype(np.uint64)])
                    return a[:, np.lexsort(a)]
                match = ("MATCH*" if np.array_equal(rows(ref), rows(host))
                         else "DIFF!")
            else:
                match = ("MATCH" if all(np.array_equal(a, b)
                                        for a, b in zip(ref, host))
                         else "DIFF!")
        best = None
        outer = max(1, REPS // SCAN_N)
        for _ in range(BATCHES):
            dep = jnp.int64(0)
            t0 = time.perf_counter()
            for _ in range(outer):
                out = step(dep)
                dep = out[2]
            int(np.asarray(dep))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        nstep = outer * (SCAN_N if SCAN_N > 1 else 1)
        ms = best / nstep * 1e3
        rate = C / (best / nstep) / 1e6
        print(f"{be:14s} {ms:7.2f} ms/step  {rate:8.0f} Mpos/s  "
              f"(compile {t_compile:.1f}s, {n} emits, {match})")


if __name__ == "__main__":
    main()
