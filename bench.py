"""Headline benchmark: modset-build k-mer throughput on one TPU chip vs the
single-core C reference (BASELINE.md: >100x target on v5e).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: synthetic read set (200 Mbp, k=16 d=16 — BASELINE config 1 shape);
"kmers" = k-mer positions hashed (totLen - (k-1)*nSeq), identical on both
sides.  The C rate comes from the reference modutils' own per-command rusage
line (compiled -O2 from /root/reference); our rate is wall time of the full
equivalent pipeline (parse + device scan + unique + exact table insert).
"""

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_DIR = Path(os.environ.get("MODIMIZER_BENCH_DIR", "/tmp/modimizer_bench"))
N_READS = int(os.environ.get("BENCH_READS", 200_000))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", 1000))
K, W, SEED, BITS = 16, 16, 17, 26


def log(msg):
    sys.stderr.write(msg + "\n")
    sys.stderr.flush()


def make_data() -> Path:
    import numpy as np
    BENCH_DIR.mkdir(parents=True, exist_ok=True)
    fa = BENCH_DIR / f"reads_{N_READS}x{READ_LEN}.fa"
    if fa.exists():
        return fa
    log(f"generating {N_READS}x{READ_LEN}bp synthetic reads ...")
    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", np.uint8)
    with open(fa, "wb") as f:
        chunk = 10_000
        for s in range(0, N_READS, chunk):
            n = min(chunk, N_READS - s)
            arr = bases[rng.integers(0, 4, size=(n, READ_LEN))]
            rows = []
            for i in range(n):
                rows.append(b">r%d\n" % (s + i))
                rows.append(arr[i].tobytes())
                rows.append(b"\n")
            f.write(b"".join(rows))
    return fa


def c_baseline(fa: Path) -> float:
    """kmer positions/sec for the reference modutils -a (single core)."""
    cache = BENCH_DIR / (fa.name + ".c_rate.json")
    if cache.exists():
        return json.loads(cache.read_text())["rate"]
    from tests.golden.harness import build_tool
    exe = build_tool("modutils")
    log("running C baseline ...")
    r = subprocess.run(
        [str(exe), "-c", str(BITS), str(K), str(W), str(SEED),
         "-a", str(fa)], capture_output=True, text=True, check=True)
    m = re.search(r"added (\d+) sequences total length (\d+) total hashes (\d+)",
                  r.stdout)
    n_seq, tot_len = int(m.group(1)), int(m.group(2))
    positions = tot_len - (K - 1) * n_seq
    # the rusage line following the 'added' summary is the -a command's cost
    tail = r.stdout[m.end():]
    t = re.search(r"user\t(\d+\.\d+)\tsystem\t(\d+\.\d+)", tail)
    secs = float(t.group(1)) + float(t.group(2))
    rate = positions / secs
    cache.write_text(json.dumps({"rate": rate, "secs": secs,
                                 "positions": positions}))
    log(f"C baseline: {positions} positions in {secs:.2f}s = {rate/1e6:.1f} M/s")
    return rate


def tpu_rate(fa: Path) -> float:
    """Chip throughput: the sharded build step on device-resident data
    (kmers/s/chip — hashing + modimizer filter + count-merge).  The full
    host-to-.mod pipeline is also run and logged for context."""
    import modimizer_tpu  # noqa: F401
    import jax
    import numpy as np
    from modimizer_tpu.core.modset import Modset
    from modimizer_tpu.core.seqhash import Seqhash
    from modimizer_tpu.io import seqio
    from modimizer_tpu.parallel.sharded import (ShardedModsetBuilder,
                                                build_mesh, sharded_build_step)

    log(f"devices: {jax.devices()}")
    sh = Seqhash.create(K, W, SEED)
    mesh = build_mesh()

    # ---- end-to-end pipeline (parse -> device count -> exact table) ----
    t0 = time.perf_counter()
    batch, _t = seqio.read_seq_file(str(fa), seqio.dna2index_n0(),
                                    is_qual=False, want_ids=False)
    t_parse = time.perf_counter()
    builder = ShardedModsetBuilder(sh, mesh)
    builder.feed_stream(batch.codes, batch.offsets)
    t_feed = time.perf_counter()
    uniq, counts = builder.finalize()
    ms = Modset(sh, BITS)
    ms.add_batch(uniq, counts)
    t1 = time.perf_counter()
    n_seq = batch.n
    tot_len = len(batch.codes)
    positions = tot_len - (K - 1) * n_seq
    e2e = positions / (t1 - t0)
    log(f"e2e: parse {t_parse-t0:.2f}s feed {t_feed-t_parse:.2f}s "
        f"finalize+table {t1-t_feed:.2f}s total {t1-t0:.2f}s -> "
        f"{e2e/1e6:.1f} Mkmers/s; {builder.total_emitted} kmers, "
        f"{ms.max} unique")

    # ---- chip rate: repeated steps on resident inputs ----
    from modimizer_tpu.ops.packed import pack_bits, pack_sw
    import jax.numpy as jnp
    b2 = ShardedModsetBuilder(sh, mesh)
    C = b2.chunk
    NW = C // 32
    n = b2.n
    codes = np.ascontiguousarray(batch.codes[:n * C + K - 1]).view(np.uint8)
    sw = np.zeros((n, NW + 2), np.uint64)
    vb = np.zeros((n, C // 64), np.uint64)
    for d in range(n):
        sw[d] = pack_sw(codes[d * C:d * C + C + K - 1], NW + 2)
        vb[d] = pack_bits(np.ones(min(C, max(0, len(codes) - d * C)), bool),
                          C // 64)
    sw_d = jnp.asarray(sw)
    vb_d = jnp.asarray(vb)
    gpos = jnp.asarray(np.arange(n, dtype=np.uint64) * np.uint64(C))

    def step():
        out = sharded_build_step(
            b2.state_k, b2.state_d, b2.state_m, sw_d, vb_d, gpos,
            k=K, w=W, factor1=sh.factor1, cap=b2.cap, n_shards=n, S=b2.S,
            C=C, mesh=mesh)
        return out

    out = step()
    b2.state_k, b2.state_d, b2.state_m = out[:3]
    np.asarray(out[4])  # sync
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step()
        b2.state_k, b2.state_d, b2.state_m = out[:3]
    np.asarray(out[4])  # sync
    t1 = time.perf_counter()
    chip = reps * n * C / (t1 - t0)
    log(f"chip rate: {chip/1e6:.1f} Mkmers/s/chip "
        f"({(t1-t0)/reps*1e3:.0f} ms/step of {n}x{C})")
    return chip


def main():
    fa = make_data()
    ours = tpu_rate(fa)
    base = c_baseline(fa)
    print(json.dumps({"metric": "modset_build_kmer_throughput",
                      "value": round(ours, 1),
                      "unit": "kmers/s",
                      "vs_baseline": round(ours / base, 2)}))


if __name__ == "__main__":
    main()
