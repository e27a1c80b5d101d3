"""Multi-device scaling harness for the sharded modset build.

BASELINE.md's scaling row asks for >=80% efficiency at 2 hosts.  Real
multi-chip hardware is not attached in this environment, so this harness
measures the full sharded pipeline (per-device scan -> all_to_all routing ->
sorted segment-reduce merge) over an N-device mesh of whatever platform is
available:

  * default: the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_
    device_count=8 JAX_PLATFORMS=cpu) -- validates that per-device work
    stays constant as devices grow (weak scaling), which is the property
    that carries to ICI;
  * on a real pod slice the same script runs unchanged and the printed
    efficiency is the ICI number.

Weak scaling: each device gets a fixed CHUNK of stream positions per step;
perfect scaling keeps step time flat as n grows.  Efficiency(n) =
t(1 device) / t(n devices) with n-proportional total work.

Usage:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            python bench_scaling.py
Prints one JSON line per mesh size plus a summary efficiency line.
"""

import json
import os
import time

# Default to the virtual CPU mesh; set MODIMIZER_SCALING_REAL=1 on an actual
# pod slice to measure ICI with the inherited platform instead.
if os.environ.get("MODIMIZER_SCALING_REAL") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    if "--xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

import modimizer_tpu  # noqa: E402

modimizer_tpu.configure_jax()
import jax  # noqa: E402

from modimizer_tpu.core.seqhash import Seqhash  # noqa: E402
from modimizer_tpu.parallel.sharded import (ShardedModsetBuilder,  # noqa: E402
                                            build_mesh)

CHUNK = 1 << 18          # positions per device per step
STEPS = 4                # timed steps
READ_LEN = 5000


def run(n_dev):
    sh = Seqhash.create(16, 16, 17)
    mesh = build_mesh(n_dev)
    total = n_dev * CHUNK * STEPS
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=total).astype(np.uint8)
    offsets = np.arange(0, total + 1, READ_LEN, dtype=np.int64)
    if offsets[-1] != total:
        offsets = np.concatenate([offsets, [total]])
    b = ShardedModsetBuilder(sh, mesh, chunk_per_dev=CHUNK,
                             state_size=1 << 22,
                             max_buffer_rows=1 << 23)
    # warm-up: one step's worth to compile
    b.feed_stream(codes[:n_dev * CHUNK], offsets[offsets <= n_dev * CHUNK])
    t0 = time.perf_counter()
    b.feed_stream(codes, offsets)
    jax.block_until_ready((b.state_k, b.state_d, b.state_m))
    dt = time.perf_counter() - t0
    # finalize outside the timed window: its sort/compact program compiles
    # on first use (seconds on the CPU mesh) and runs once per BUILD, not
    # per step — the weak-scaling claim is about the steady-state step
    ks, _ = b.finalize()
    return dt, total / dt / 1e6, len(ks)


def main():
    sizes = [n for n in (1, 2, 4, 8) if n <= jax.device_count()]
    times = {}
    for n in sizes:
        dt, rate, uniq = run(n)
        times[n] = dt
        print(json.dumps({"devices": n, "time_s": round(dt, 3),
                          "rate_mpos_s": round(rate, 1), "unique": uniq}))
    if len(sizes) > 1:
        base = times[sizes[0]]
        on_cpu = jax.devices()[0].platform == "cpu"
        for n in sizes[1:]:
            if on_cpu:
                # Virtual devices share this host's cores, so t(n) ~ n*t(1)
                # even with zero communication cost; report the per-work
                # overhead factor instead (1.0 = routing/merge adds nothing
                # beyond the n-fold serialized compute).  True ICI efficiency
                # needs real chips: MODIMIZER_SCALING_REAL=1 on a pod slice.
                print(json.dumps({"metric": "per_work_overhead_factor",
                                  "devices": n,
                                  "value": round(times[n] / (n * base), 3)}))
            else:
                print(json.dumps({"metric": "weak_scaling_efficiency",
                                  "devices": n,
                                  "value": round(base / times[n], 3)}))


if __name__ == "__main__":
    main()
