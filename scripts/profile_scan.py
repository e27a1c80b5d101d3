"""Capture a jax profiler trace of the scan step and print the op-level
time breakdown (parsed from the trace protobuf's trace.json.gz).

Usage: python scripts/profile_scan.py [backend|front|front32] [C_log2]
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import modimizer_tpu  # noqa: F401

import jax
import jax.numpy as jnp

from modimizer_tpu.core.seqhash import Seqhash
from modimizer_tpu.ops.packed import mod_is_zero, pack_bits, pack_sw
from modimizer_tpu.ops.seqhash import scan_bo
from modimizer_tpu.parallel.sharded import (_expand_valid, _scan_front,
                                            _scan_front_u32,
                                            _scan_compact_local)

K, W, SEED = 16, 16, 17
BE = sys.argv[1] if len(sys.argv) > 1 else "onehot_i8"
C_LOG2 = int(sys.argv[2]) if len(sys.argv) > 2 else 24
TRACE_DIR = os.environ.get("MODIMIZER_TRACE_DIR", "/tmp/scan_trace")


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    sh = Seqhash.create(K, W, SEED)
    C = 1 << C_LOG2
    bo = scan_bo(W)
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, C + K - 1).astype(np.uint8)
    sw_d = jnp.asarray(pack_sw(codes, C // 32 + 2))
    vb_d = jnp.asarray(pack_bits(np.ones(C, bool), C // 64))

    if BE == "kmers":
        # the kmers-only e2e chunk program (modutils -a / bench e2e),
        # with whatever MODIMIZER_COMPACT/DENSIFY/BLK the env selects
        from modimizer_tpu.ops.device_scan import _scan_chunk_kmers
        cap = C // W + (C // W) // 4 + 4096
        kwk = dict(k=K, w=W, factor1=sh.factor1, bo=bo, cap=cap)

        def step(dep):
            swx = sw_d.at[0].set(
                sw_d[0] ^ (dep.astype(jnp.uint64) & jnp.uint64(1)))
            ok, tot = _scan_chunk_kmers(swx, vb_d, **kwk)
            chk = tot.astype(jnp.int64) + jnp.sum(
                ok.astype(jnp.uint64)).astype(jnp.int64)
            return None, None, chk, None
    elif BE in ("front", "front32"):
        @jax.jit
        def stepfn(swx, vb):
            fr = _scan_front_u32 if BE == "front32" else _scan_front
            hashes, kmers, pos, isF = fr(swx, k=K, factor1=sh.factor1, C=C)
            emit = _expand_valid(vb, C) & mod_is_zero(hashes, W)
            n = jnp.sum(emit).astype(jnp.int64)
            chk = jnp.sum(jnp.where(emit, kmers.astype(jnp.uint64),
                                    jnp.uint64(0)))
            return None, None, n + chk.astype(jnp.int64), None

        def step(dep):
            swx = sw_d.at[0].set(
                sw_d[0] ^ (dep.astype(jnp.uint64) & jnp.uint64(1)))
            return stepfn(swx, vb_d)
    else:
        def step(dep):
            swx = sw_d.at[0].set(
                sw_d[0] ^ (dep.astype(jnp.uint64) & jnp.uint64(1)))
            return _scan_compact_local(swx, vb_d, k=K, w=W,
                                       factor1=sh.factor1, C=C, bo=bo,
                                       backend=BE)

    out = step(jnp.int64(0))
    int(np.asarray(out[2]))  # compile + warm

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        dep = jnp.int64(0)
        for _ in range(8):
            out = step(dep)
            dep = out[2]
        int(np.asarray(dep))

    # parse the newest trace.json.gz
    time.sleep(1)
    cands = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz",
                             recursive=True), key=os.path.getmtime)
    if not cands:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(cands[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # pick the device-side lanes (XLA Ops)
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_op = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = tid_names.get((e.get("pid"), e.get("tid")), "")
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if "XLA Ops" not in lane and "XLA TPU Ops" not in lane:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_op[name] += dur
        cnt[name] += 1
        total += dur
    print(f"lanes seen: {sorted(set(tid_names.values()))[:12]}",
          file=sys.stderr)
    print(f"== op breakdown ({BE}, 8 steps, total {total:.2f} ms device) ==")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms/8:9.3f} ms/step  x{cnt[name]//8:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
