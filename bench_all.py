"""Timed ours-vs-reference runs of all five BASELINE.md benchmark configs.

BASELINE.json:6-12 names the configs; BASELINE.md records that the reference
publishes no numbers, so the baseline IS the compiled reference binary
(-O3, tests/golden/harness.py) timed on the same machine and data:

  1. composition + modset build          (E. coli-like reads, k=16 d=16)
  2. depth histogram + single-copy kmers (modutils -p/-s)
  3. modmap long reads vs reference      (k=24)
  4. modset merge + copy-number annotate (single-host timing of the same
     merge math the multi-host path runs; device scaling: bench_scaling.py)
  5. modasm overlap triage + assembly

Prints one JSON line per config: {"config", "name", "ref_s", "ours_s",
"speedup", "ref_cpu_s", "ours_cpu_s", "cpu_speedup"} — wall and child-CPU
(RUSAGE_CHILDREN) minima over interleaved reps; the cpu numbers are
steal-immune on this heavily contended 1-core VM.  Synthetic data is
cached in /tmp/modimizer_bench_all.
`bench.py` remains the driver's headline single-metric benchmark.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
from tests.golden import harness  # noqa: E402

DATA = "/tmp/modimizer_bench_all"
B = np.frombuffer(b"ACGT", np.uint8)


def _seq(codes):
    return B[codes].tobytes().decode()


def _write_reads(path, genome_codes, n, length, rng, err=0.002):
    g = len(genome_codes)
    starts = rng.integers(0, g - length, size=n)
    flips = rng.integers(0, 2, size=n)
    with open(path, "w") as f:
        for lo in range(0, n, 4096):
            chunk = []
            for i in range(lo, min(n, lo + 4096)):
                r = genome_codes[starts[i]:starts[i] + length].copy()
                ne = rng.binomial(length, err)
                if ne:
                    pos = rng.integers(0, length, size=ne)
                    r[pos] = (r[pos] + rng.integers(1, 4, size=ne)) % 4
                if flips[i]:
                    r = (r[::-1] ^ 3).astype(np.uint8)
                chunk.append(f">r{i}\n{_seq(r)}\n")
            f.write("".join(chunk))


def make_data():
    os.makedirs(DATA, exist_ok=True)
    stamp = os.path.join(DATA, "ok")
    if os.path.exists(stamp):
        return
    # production-scale shapes: startup costs must be noise, per BASELINE.md
    rng = np.random.default_rng(2026)
    g1 = rng.integers(0, 4, size=20_000_000).astype(np.uint8)   # 20 Mb genome
    _write_reads(os.path.join(DATA, "reads1.fa"), g1, 300_000, 500, rng)
    _write_reads(os.path.join(DATA, "reads4.fa"), g1[10_000_000:], 150_000,
                 500, rng)
    g3 = rng.integers(0, 4, size=32_000_000).astype(np.uint8)   # chr20-scale
    with open(os.path.join(DATA, "ref3.fa"), "w") as f:
        f.write(">chr\n" + _seq(g3) + "\n")
    _write_reads(os.path.join(DATA, "query3.fa"), g3, 4_000, 10_000, rng,
                 err=0.02)
    g5 = g1[:2_000_000]
    _write_reads(os.path.join(DATA, "reads5.fa"), g5, 8_000, 5_000, rng,
                 err=0.001)
    open(stamp, "w").write("ok")


def _run(cmd, cwd, env=None):
    import resource
    r0 = resource.getrusage(resource.RUSAGE_CHILDREN)
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd=cwd, capture_output=True, text=True, env=env)
    dt = time.perf_counter() - t0
    r1 = resource.getrusage(resource.RUSAGE_CHILDREN)
    assert r.returncode == 0, (cmd, r.stderr[-800:])
    cpu = (r1.ru_utime - r0.ru_utime) + (r1.ru_stime - r0.ru_stime)
    return dt, cpu


NATIVE_CLI = os.path.join(REPO, "bin", "modutils-native")


def build_native_cli():
    """Build the C++ modutils fast path via the single shared recipe
    (modimizer_tpu.native.build_cli); falls back to the Python CLI when
    the toolchain is missing."""
    from modimizer_tpu.native import build_cli
    if build_cli() is None:
        sys.stderr.write("native CLI build unavailable, using Python CLI\n")
        return False
    return True


def timed_pair(name, tool, arg_lists, fixture=None):
    """Run the command list(s) through the reference binary and through our
    CLI in separate work dirs; return (ref_s, ours_s)."""
    bin_ref = str(harness.build_tool(tool))
    bin_ours = [sys.executable, os.path.join(REPO, "bin", tool)]
    if tool == "modutils" and os.path.exists(NATIVE_CLI):
        # the native fast path IS our modutils front door: it executes the
        # subset command shapes itself and execs the Python CLI for the
        # rest, so timing it is timing the shipped user experience
        bin_ours = [NATIVE_CLI]
    # One-shot CLI runs on this machine reach the TPU through the axon
    # tunnel, whose transfer cost swamps single-pass scans at these sizes;
    # use the native OpenMP host scan here.  Device-path throughput is
    # bench.py's job (measured on-chip, steady state).  Dropping
    # PALLAS_AXON_POOL_IPS skips this image's sitecustomize axon/jax
    # registration (~4 s of every python start the C binaries don't pay).
    env = {**os.environ, "MODIMIZER_SCAN": "host",
           "MODIMIZER_PYTHON": sys.executable}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = {"ref": [], "ours": []}
    reps = int(os.environ.get("MODIMIZER_BENCH_REPS", "3"))
    sides = {"ref": [bin_ref], "ours": bin_ours}
    for side in sides:
        d = os.path.join(DATA, f"{name}_{side}")
        os.makedirs(d, exist_ok=True)
        if fixture:
            fixture(d)
    # INTERLEAVED min-of-n: this 1-core VM's steal-time noise swings >20%
    # on minute scales, so consecutive same-side reps share the same bad
    # window; alternating ref/ours pairs the noise across sides.  Each rep
    # records (wall, cpu); cpu (RUSAGE_CHILDREN) is steal-immune and is
    # what the reference itself reports after every command.
    for _ in range(reps):
        for side, prefix in sides.items():
            d = os.path.join(DATA, f"{name}_{side}")
            runs = [_run(prefix + [str(a) for a in args], d,
                         env=env if side == "ours" else None)
                    for args in arg_lists]
            out[side].append((sum(w for w, _ in runs),
                              sum(c for _, c in runs)))
    ref_w = min(w for w, _ in out["ref"])
    ref_c = min(c for _, c in out["ref"])
    ours_w = min(w for w, _ in out["ours"])
    ours_c = min(c for _, c in out["ours"])
    return (ref_w, ref_c), (ours_w, ours_c)


def fixture_mod1(d):
    """Each side's config-2/4 input: the X1.mod its own config-1 run wrote
    (byte-identical across sides — asserted below)."""
    src = os.path.join(DATA, "c1_" + os.path.basename(d).split("_")[-1],
                       "X1.mod")
    dst = os.path.join(d, "X1.mod")
    if not os.path.exists(dst):
        import shutil
        shutil.copy(src, dst)


def main():
    make_data()
    build_native_cli()
    results = []

    # 1. composition + modset build
    ref_s, ours_s = timed_pair("c1", "composition",
                               [["-b", "-l", os.path.join(DATA, "reads1.fa")]])
    r2, o2 = timed_pair("c1", "modutils",
                        [["-c", "24", "16", "16", "17",
                          "-a", os.path.join(DATA, "reads1.fa"),
                          "-w", "X1.mod"]])
    a = open(os.path.join(DATA, "c1_ref", "X1.mod"), "rb").read()
    b = open(os.path.join(DATA, "c1_ours", "X1.mod"), "rb").read()
    assert a == b, "config-1 .mod outputs diverged"
    results.append((1, "composition+modset_build",
                    (ref_s[0] + r2[0], ref_s[1] + r2[1]),
                    (ours_s[0] + o2[0], ours_s[1] + o2[1])))

    # 2. depth histogram + single-copy k-mer selection
    ref_s, ours_s = timed_pair(
        "c2", "modutils",
        [["-r", "X1.mod", "-p", "1", "200", "-s", "4", "18", "40",
          "-w", "X2.mod"]], fixture=fixture_mod1)
    results.append((2, "depth_histogram+single_copy", ref_s, ours_s))

    # 3. modmap long reads vs 2Mb reference, k=24
    ref_s, ours_s = timed_pair(
        "c3", "modmap",
        [["-K", "24", "-W", "13", "-S", "7", "-B", "26",
          "-f", os.path.join(DATA, "ref3.fa"), "-w", "refidx"],
         ["-r", "refidx", "-q", os.path.join(DATA, "query3.fa")]])
    results.append((3, "modmap_long_reads_k24", ref_s, ours_s))

    # 4. modset merge + copy-number annotation.  The reference's -m reads
    # with plain fopen (cannot open its own gzipped output), so feed it a
    # zcat'd copy; ours gets the same plain file.
    import gzip
    for side in ("ref", "ours"):
        d = os.path.join(DATA, f"c4_{side}")
        os.makedirs(d, exist_ok=True)
        fixture_mod1(d)
        plain = os.path.join(d, "Y_plain.mod")
        if not os.path.exists(plain):
            y = subprocess.run(
                [str(harness.build_tool("modutils")), "-c", "24", "16", "16",
                 "17", "-a", os.path.join(DATA, "reads4.fa"),
                 "-w", os.path.join(d, "Y.mod")], capture_output=True)
            assert y.returncode == 0
            open(plain, "wb").write(
                gzip.open(os.path.join(d, "Y.mod"), "rb").read())
    ref_s, ours_s = timed_pair(
        "c4", "modutils",
        [["-r", "X1.mod", "-m", "Y_plain.mod", "-w", "M.mod"]],
        fixture=fixture_mod1)
    results.append((4, "modset_merge+copy_number", ref_s, ours_s))

    # 5. modasm overlap triage + assembly (shared .mod fixture, not timed)
    mod5 = os.path.join(DATA, "X5.mod")
    if not os.path.exists(mod5):
        r = subprocess.run(
            [str(harness.build_tool("modutils")), "-c", "20", "16", "16",
             "17", "-a", os.path.join(DATA, "reads5.fa"),
             "-s", "4", "18", "40", "-w", mod5], capture_output=True)
        assert r.returncode == 0
    ref_s, ours_s = timed_pair(
        "c5", "modasm",
        [["-m", mod5, "-f", os.path.join(DATA, "reads5.fa"),
          "-S", "-b", "-c", "-u", "-C",
          "-o1", "5", "-o2", "17", "-o3", "3", "7", "-a1", "5"]])
    results.append((5, "modasm_overlap+assembly", ref_s, ours_s))

    for cfg, name, r, o in results:
        print(json.dumps({"config": cfg, "name": name,
                          "ref_s": round(r[0], 2), "ours_s": round(o[0], 2),
                          "speedup": round(r[0] / o[0], 2),
                          "ref_cpu_s": round(r[1], 2),
                          "ours_cpu_s": round(o[1], 2),
                          "cpu_speedup": round(r[1] / o[1], 2)}))


if __name__ == "__main__":
    main()
