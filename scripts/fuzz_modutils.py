import os, sys, subprocess, random
sys.path.insert(0, "/root/repo")
import numpy as np
from tests.golden import harness
D = "/tmp/modimizer_fuzz"
os.makedirs(D, exist_ok=True)
B = np.frombuffer(b"ACGT", np.uint8)
rng = np.random.default_rng(1234)
with open(f"{D}/a.fa", "w") as f:
    for i in range(300):
        f.write(f">r{i}\n{B[rng.integers(0,4,size=int(rng.integers(60,800)))].tobytes().decode()}\n")
with open(f"{D}/b.fa", "w") as f:
    for i in range(200):
        f.write(f">s{i}\n{B[rng.integers(0,4,size=500)].tobytes().decode()}\n")

MU = str(harness.build_tool("modutils"))
# base modsets for -r/-m chains (the native fast path's home turf):
# built once by the REFERENCE binary so both sides load identical bytes.
# They must be big enough (>= ~131k entries) that EVERY side array the
# reference reallocs on merge crosses glibc's 128 KB mmap threshold —
# below it, modsetMerge reads malloc heap garbage into depth/info of the
# resized arrays and its summary output is nondeterministic (the
# documented reference quirk; .claude verify notes + stress harness)
for nm, seed in (("base1", 77), ("base2", 78)):
    if not os.path.exists(f"{D}/{nm}.mod"):
        r2 = np.random.default_rng(seed)
        with open(f"{D}/{nm}.fa", "w") as f:
            for i in range(3000):
                sq = B[r2.integers(0, 4, size=800)].tobytes().decode()
                f.write(f">m{i}\n{sq}\n")
        subprocess.run([MU, "-c", "21", "16", "16", "17",
                        "-a", f"{D}/{nm}.fa", "-w", f"{D}/{nm}.mod"],
                       capture_output=True, check=True)
        import gzip as _gz
        open(f"{D}/{nm}_plain.mod", "wb").write(
            _gz.open(f"{D}/{nm}.mod", "rb").read())
import os as _os
# route through the native front door when built: it executes the
# -r/-p/-s/-sM/-m/-w subset itself and delegates the rest to the Python
# CLI, so fuzzing it covers both implementations (set
# MODIMIZER_FUZZ_PYCLI=1 to fuzz the Python CLI directly)
if (_os.path.exists("/root/repo/bin/modutils-native")
        and not _os.environ.get("MODIMIZER_FUZZ_PYCLI")):
    PY = ["/root/repo/bin/modutils-native"]
else:
    PY = [sys.executable, "/root/repo/bin/modutils"]

def flt(b):
    t = b.decode("latin1")
    return "\n".join(l for l in t.splitlines()
                     if not l.startswith("user\t") and "resources used" not in l)

R = random.Random(7)
def chain(i):
    cmds = []
    has_ms = False
    n = R.randint(1, 6)
    # half the chains are -r-rooted (the native fast path executes these
    # itself when every later command is in its subset; a -a/-x/-H/...
    # mid-chain flips it to whole-chain delegation — both paths fuzzed)
    if R.random() < 0.5:
        cmds += ["-r", f"{D}/{R.choice(['base1', 'base2'])}.mod"]
        has_ms = True
    # -m only while the heap is "clean": once a big sequence buffer has
    # been malloc'd and freed (-a/-x/-P), glibc's adaptive mmap threshold
    # makes the reference's merge-resized arrays come from dirty heap and
    # its depth/summary output is garbage (nondeterministic by design —
    # same quirk class as the <128KB case; harness.py notes)
    dirty = False
    for _ in range(n):
        roll = R.random()
        if R.random() < 0.12 and has_ms and not dirty:
            cmds += ["-m", f"{D}/{R.choice(['base1', 'base2'])}_plain.mod"]
            continue
        if not has_ms or roll < 0.15:
            cmds += ["-c", str(R.choice([20, 21])), "16",
                     str(R.choice([8, 16, 17])), "17"]
            has_ms = True
        elif roll < 0.35:
            cmds += ["-a", f"{D}/{R.choice(['a','b'])}.fa"]
            dirty = True
        elif roll < 0.45:
            cmds += ["-p", str(R.randint(1, 3)), str(R.randint(4, 99))]
        elif roll < 0.55:
            cmds += ["-s", str(R.randint(2, 5)), str(R.randint(6, 20)),
                     str(R.randint(21, 90))]
        elif roll < 0.62:
            cmds += ["-sM", str(R.randint(2, 30))]
        elif roll < 0.70:
            cmds += ["-H", f"h{i}.his"]
        elif roll < 0.78:
            cmds += ["-x", str(R.randint(1, 20))]
            dirty = True
        elif roll < 0.86:
            cmds += ["-w", f"w{i}.mod"]
        elif roll < 0.93:
            cmds += ["-wt", f"t{i}.txt"]
        else:
            cmds += ["-P", f"{D}/b.fa"]
            dirty = True
    return cmds

fails = 0
for i in range(40):
    args = chain(i)
    dc, dp = f"{D}/c{i}", f"{D}/p{i}"
    import shutil
    shutil.rmtree(dc, ignore_errors=True); shutil.rmtree(dp, ignore_errors=True)
    os.makedirs(dc); os.makedirs(dp)
    rc = subprocess.run([MU] + args, capture_output=True, cwd=dc, timeout=120)
    rp = subprocess.run(PY + args, capture_output=True, cwd=dp, timeout=300,
                        env={**os.environ, "MODIMIZER_SCAN": "host",
                             "MODIMIZER_PYTHON": sys.executable})
    ok = (rc.returncode == rp.returncode and flt(rc.stdout) == flt(rp.stdout)
          and flt(rc.stderr) == flt(rp.stderr))
    if ok:
        for fn in os.listdir(dc):
            a = open(f"{dc}/{fn}", "rb").read()
            b = open(f"{dp}/{fn}", "rb").read() if os.path.exists(f"{dp}/{fn}") else None
            if a != b:
                ok = False; print(f"[{i}] FILE DIFF {fn}", " ".join(args)); break
    if not ok:
        fails += 1
        print(f"[{i}] MISMATCH:", " ".join(args))
        print("  rc", rc.returncode, rp.returncode)
        ca, pa = flt(rc.stdout).splitlines(), flt(rp.stdout).splitlines()
        for x, y in zip(ca, pa):
            if x != y:
                print("  C :", x[:120]); print("  PY:", y[:120]); break
        ce, pe = flt(rc.stderr).splitlines(), flt(rp.stderr).splitlines()
        for x, y in zip(ce, pe):
            if x != y:
                print("  Cerr :", x[:120]); print("  PYerr:", y[:120]); break
print(f"fuzz done: {40 - fails}/40 chains identical")
