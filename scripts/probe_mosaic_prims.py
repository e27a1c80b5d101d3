"""Micro-probes of Mosaic compaction primitives on the live chip.

Each probe processes the equivalent of C=2^24 positions' worth of work and
reports ms per 2^24, so numbers compose directly with the front probe.

Probes:
  tala16   - take_along_axis along a 16-sublane axis ([16, MJ] u32, per-lane
             dynamic sublane indices): the L1 local-compaction primitive.
  dot16    - batched in-VMEM one-hot pl.dot: per step 16 blocks of 1024
             positions, [16, 112, 1024] i8 @ [16, 1024, 8] i8 -> s32.
  roll     - pltpu.roll along lanes on [16, MJ] u32 x 12 stages (Hillis-
             Steele cumsum cost model).
  cumsum128- two-level MXU cumsum: [G,128]i8 @ UT128 + group offsets.
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

C = 1 << 24
MJ = 4096
NJ = C // 16
GRID = NJ // MJ           # 256 steps == 2^24 positions


def timeit(fn, *args):
    """fn(dep, *args) -> out array; each call consumes a scalar of the
    previous output (the axon tunnel ignores block_until_ready, so the
    chain + final 1-element pull is the only honest sync)."""
    dep = jnp.uint32(0)
    r = fn(dep, *args)
    _ = np.asarray(r.reshape(-1)[0])        # compile + warm + sync
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        dep = jnp.uint32(0)
        for _ in range(8):
            r = fn(dep, *args)
            dep = r.reshape(-1)[0].astype(jnp.uint32)
        _ = np.asarray(dep)
        dt = (time.perf_counter() - t0) / 8
        best = dt if best is None else min(best, dt)
    return best


def probe_tala16():
    def kern(x_ref, i_ref, o_ref):
        x = x_ref[:, :]
        idx = (i_ref[:, :] & jnp.uint32(15)).astype(jnp.int32)
        took = jnp.take_along_axis(x, idx[:8, :], axis=0)   # [8, MJ]
        o_ref[:, :] = took

    @jax.jit
    def run(dep, x, i):
        x = x.at[0, 0].set(x[0, 0] ^ dep)
        return pl.pallas_call(
            kern, grid=(GRID,),
            in_specs=[pl.BlockSpec((16, MJ), lambda g: (g * 0, g),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((8, MJ), lambda g: (g * 0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, NJ), jnp.uint32),
        )(x, i)

    x = jnp.arange(16 * NJ, dtype=jnp.uint32).reshape(16, NJ)
    i = jnp.arange(16 * NJ, dtype=jnp.uint32).reshape(16, NJ) * 7
    dt = timeit(run, x, i)
    print(f"tala16 (8 rows out): {dt*1e3:7.2f} ms/2^24")


def probe_dot16():
    BLK, BO, NC = 1024, 112, 8

    def kern(e_ref, c_ref, o_ref):
        # build one-hot from ranks in-VMEM, one block per sublane group
        csum = e_ref[:, :]                       # [16, BLK] i32 ranks
        acc = []
        for b in range(16):
            dest = csum[b:b+1, :]                # [1, BLK]
            slots = jax.lax.broadcasted_iota(jnp.int32, (BO, BLK), 0)
            oh = (jnp.broadcast_to(dest, (BO, BLK)) == slots).astype(jnp.int8)
            cols = c_ref[b]                      # [BLK, NC] i8
            acc.append(jax.lax.dot_general(
                oh, cols, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32))
        o_ref[:, :, :] = jnp.stack(acc, axis=0)

    @jax.jit
    def run(dep, e, c):
        e = e.at[0, 0].set(e[0, 0] ^ dep.astype(jnp.int32))
        return pl.pallas_call(
            kern, grid=(GRID // 16,),   # 16 blocks/step -> 16384 pos/step
            in_specs=[
                pl.BlockSpec((16, BLK), lambda g: (g, g * 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, BLK, NC), lambda g: (g, g * 0, g * 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, BO, NC), lambda g: (g, g * 0, g * 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, BO, NC), jnp.int32),
        )(e, c)

    nb = C // BLK
    e = (jnp.arange(16 * BLK, dtype=jnp.int32) % 117).reshape(16, BLK)
    c = jnp.ones((16, BLK, NC), jnp.int8)
    dt = timeit(run, e, c)
    # one grid covers 16 blocks; full chunk needs nb/16 = GRID work units,
    # and run() already iterates GRID//16 steps of 16 blocks = C positions
    print(f"dot16 [16x112x1024x8 i8/step]: {dt*1e3:7.2f} ms/2^24")


def probe_roll():
    def kern(x_ref, o_ref):
        x = x_ref[:, :]
        acc = x
        for s in range(12):
            acc = acc + pltpu.roll(acc, 1 << s, 1)
        o_ref[:, :] = acc

    @jax.jit
    def run(dep, x):
        x = x.at[0, 0].set(x[0, 0] ^ dep)
        return pl.pallas_call(
            kern, grid=(GRID,),
            in_specs=[pl.BlockSpec((16, MJ), lambda g: (g * 0, g),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((16, MJ), lambda g: (g * 0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, NJ), jnp.uint32),
        )(x)

    x = jnp.arange(16 * NJ, dtype=jnp.uint32).reshape(16, NJ)
    dt = timeit(run, x)
    print(f"roll x12 stages:     {dt*1e3:7.2f} ms/2^24")


def probe_cumsum128():
    # in-block cumsum of an i8 emit mask via UT128 dot: [G,128]@[128,128]
    G = MJ * 16 // 128      # rows per step so one step = 16*MJ positions

    def kern(e_ref, o_ref):
        ut = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
              <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
              ).astype(jnp.int8)
        o_ref[:, :] = jax.lax.dot_general(
            e_ref[:, :], ut, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @jax.jit
    def run(dep, e):
        e = e.at[0, 0].set(e[0, 0] ^ dep.astype(jnp.int8))
        return pl.pallas_call(
            kern, grid=(GRID,),
            in_specs=[pl.BlockSpec((G, 128), lambda g: (g, g * 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, 128), lambda g: (g, g * 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G * GRID, 128), jnp.int32),
        )(e)

    e = jnp.ones((G * GRID, 128), jnp.int8)
    dt = timeit(run, e)
    print(f"cumsum128 (UT dot):  {dt*1e3:7.2f} ms/2^24")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    which = sys.argv[1:] or ["tala16", "roll", "cumsum128", "dot16"]
    for name in which:
        try:
            globals()["probe_" + name]()
        except Exception as e:
            print(f"{name} FAIL: {str(e)[-200:]}")
