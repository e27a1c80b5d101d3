"""Profile the kmers-only e2e chunk program on chip AND dump its compiled
HLO, so profiler op names (reshape.N, broadcast.N) map to instructions.

    MODIMIZER_DENSIFY=roll python scripts/profile_kmers_hlo.py [C_log2]
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
from modimizer_tpu.ops.device_scan import _scan_kmers_body
from modimizer_tpu.ops.packed import pack_bits, pack_sw
from modimizer_tpu.ops.seqhash import scan_bo

K, W, SEED = 16, 16, 17
C_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 24
TRACE_DIR = os.environ.get("MODIMIZER_TRACE_DIR", "/tmp/kmers_trace")
HLO_OUT = os.environ.get("MODIMIZER_HLO_OUT", "/tmp/kmers_chunk_hlo.txt")


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    sh = Seqhash.create(K, W, SEED)
    C = 1 << C_LOG2
    bo = scan_bo(W)
    cap = C // W + (C // W) // 4 + 4096
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, C + K - 1).astype(np.uint8)
    sw_d = jnp.asarray(pack_sw(codes, C // 32 + 2))
    vb_d = jnp.asarray(pack_bits(np.ones(C, bool), C // 64))

    @jax.jit
    def stepfn(swx, vb):
        ok, tot = _scan_kmers_body(swx, vb, k=K, w=W, factor1=sh.factor1,
                                   bo=bo, cap=cap)
        chk = tot.astype(jnp.int64) + jnp.sum(
            ok.astype(jnp.uint64)).astype(jnp.int64)
        return chk

    def step(dep):
        swx = sw_d.at[0].set(
            sw_d[0] ^ (dep.astype(jnp.uint64) & jnp.uint64(1)))
        return stepfn(swx, vb_d)

    lowered = jax.jit(stepfn).lower(sw_d, vb_d)
    compiled = lowered.compile()
    with open(HLO_OUT, "w") as f:
        f.write(compiled.as_text())
    print(f"HLO written to {HLO_OUT}", file=sys.stderr)

    dep = step(jnp.int64(0))
    int(np.asarray(dep))  # warm
    t0 = time.perf_counter()
    dep = jnp.int64(0)
    for _ in range(8):
        dep = step(dep)
    int(np.asarray(dep))
    wall = (time.perf_counter() - t0) / 8
    print(f"wall: {wall*1e3:.2f} ms/step = {C/wall/1e6:.0f} Mpos/s")

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        dep = jnp.int64(0)
        for _ in range(8):
            dep = step(dep)
        int(np.asarray(dep))

    time.sleep(1)
    cands = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz",
                             recursive=True), key=os.path.getmtime)
    if not cands:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(cands[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
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
        dur = e.get("dur", 0) / 1e3
        by_op[e.get("name", "?")] += dur
        cnt[e.get("name", "?")] += 1
        total += dur
    print(f"== op breakdown (8 steps, total {total:.2f} ms device) ==")
    hlo = Path(HLO_OUT).read_text()
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        # find the instruction line for this op name in the HLO
        line = ""
        for ln in hlo.splitlines():
            s = ln.strip()
            if s.startswith(f"%{name} ") or s.startswith(f"{name} ") \
                    or f" %{name} = " in ln or s.startswith(f"%{name}."):
                line = s[:180]
                break
        print(f"{ms/8:9.3f} ms/step x{cnt[name]//8:<3d} {name[:40]}")
        if line:
            print(f"           {line}")


if __name__ == "__main__":
    main()
