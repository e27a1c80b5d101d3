"""Probe: isolate Mosaic per-op costs for the scan front (see docs/PERF.md
round 3).  Each probe is one pallas_call with grid (8,16) over [128,1024]
u32 tiles, dependency-chained across reps."""

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

T, R, LANES = 8, 1024, 128

w0h = np.random.default_rng(0).integers(0, 2**32, (T, LANES, R),
                                        dtype=np.uint64).astype(np.uint32)
w0d = jnp.asarray(w0h)


def mk(body):
    def kern(w_ref, o_ref):
        r = pl.program_id(1)
        o_ref[0] = body(w_ref[0], r)

    @jax.jit
    def run(x, s):
        x = x.at[0, 0, 0].set(x[0, 0, 0] ^ (s.astype(jnp.uint32)
                                            & jnp.uint32(1)))
        return pl.pallas_call(
            kern,
            grid=(T, 16),
            in_specs=[pl.BlockSpec((1, LANES, R),
                                   lambda t, r: (t, t * 0, t * 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, LANES, R),
                                   lambda t, r: (t, t * 0, t * 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, LANES, R), jnp.uint32),
        )(x)
    return run


def bench(name, run):
    t0 = time.perf_counter()
    o = run(w0d, jnp.uint32(0))
    np.asarray(o[0, 0, 0])
    tc = time.perf_counter() - t0
    best = None
    for _ in range(3):
        dep = jnp.uint32(0)
        t0 = time.perf_counter()
        for _ in range(8):
            o = run(w0d, dep)
            dep = o[0, 0, 0]
        int(np.asarray(dep))
        d = (time.perf_counter() - t0) / 8
        best = d if best is None else min(best, d)
    print(f'{name:34s} {best*1e3:7.2f} ms/call (128 steps of [128,1024], '
          f'compile {tc:.0f}s)', flush=True)


def dynf(w, r):
    sr = jnp.uint32(2) * r.astype(jnp.uint32)
    sl = (jnp.uint32(32) - sr) & jnp.uint32(31)
    return jnp.where(r == 0, w, (w << sr) | (w >> sl))


def muls(w, r):
    x = w
    for _ in range(10):
        x = x * jnp.uint32(0x9E3779B9) + jnp.uint32(1)
    return x


def iotas(w, r):
    li = jax.lax.broadcasted_iota(jnp.uint32, (LANES, R), 0)
    wi = jax.lax.broadcasted_iota(jnp.uint32, (LANES, R), 1)
    return w + jnp.uint32(16) * (wi * jnp.uint32(LANES) + li)


PROBES = {
    'copy': lambda w, r: w,
    'static16': lambda w, r: (w << jnp.uint32(14)) | (w >> jnp.uint32(18)),
    'dyn': dynf,
    'mul10': muls,
    'iota': iotas,
}

if __name__ == '__main__':
    names = sys.argv[1:] or list(PROBES)
    print(f'devices: {jax.devices()}', file=sys.stderr)
    for n in names:
        bench(n, mk(PROBES[n]))
