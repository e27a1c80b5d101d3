import os, sys, subprocess, random
sys.path.insert(0, "/root/repo")
import numpy as np
from tests.golden import harness
D = "/tmp/modimizer_fuzz"
B = np.frombuffer(b"ACGT", np.uint8)
rng = np.random.default_rng(55)
g = rng.integers(0, 4, size=120000).astype(np.uint8)
with open(f"{D}/asm.fa", "w") as f:
    for i in range(150):
        st = int(rng.integers(0, 110000)); L = int(rng.integers(2000, 9000))
        r = g[st:st + L]
        if rng.integers(0, 2):
            r = (r[::-1] ^ 3).astype(np.uint8)
        f.write(f">q{i}\n{B[r].tobytes().decode()}\n")
with open(f"{D}/ref.fa", "w") as f:
    f.write(">g\n" + B[g[:30000]].tobytes().decode() + "\n")
MU = str(harness.build_tool("modutils"))
subprocess.run([MU, "-c", "20", "16", "16", "17", "-a", f"{D}/asm.fa",
                "-s", "4", "18", "40", "-w", f"{D}/asm.mod"],
               check=True, capture_output=True)
MA = str(harness.build_tool("modasm"))
PY = [sys.executable, "/root/repo/bin/modasm"]

def flt(b):
    t = b.decode("latin1")
    return "\n".join(l for l in t.splitlines()
                     if not l.startswith("user\t") and "resources used" not in l)

import gzip
from tests.test_modasm_parity import normalize_readset
R = random.Random(11)
fails = 0
N = 25
for i in range(N):
    cmds = ["-m", f"{D}/asm.mod", "-f", f"{D}/asm.fa"]
    for _ in range(R.randint(1, 5)):
        roll = R.random()
        if roll < 0.12: cmds += ["-S"]
        elif roll < 0.28: cmds += ["-b"]
        elif roll < 0.42: cmds += ["-c"]
        elif roll < 0.52: cmds += ["-C"]
        elif roll < 0.60: cmds += ["-P"]
        elif roll < 0.68: cmds += ["-o1", str(R.randint(2, 9))]
        elif roll < 0.74: cmds += ["-o2", str(R.randint(5, 60))]
        elif roll < 0.80: cmds += ["-o3", str(R.randint(1, 5)), str(R.randint(6, 12))]
        elif roll < 0.86: cmds += ["-a1", str(R.randint(1, 6))]
        elif roll < 0.92: cmds += ["-R", f"{D}/ref.fa"]
        else: cmds += ["-T", str(R.randint(2, 4)), str(R.randint(30, 80))]
    if R.random() < 0.5:
        cmds += ["-w", f"o{i}"]
    dc, dp = f"{D}/ac{i}", f"{D}/ap{i}"
    os.makedirs(dc, exist_ok=True); os.makedirs(dp, exist_ok=True)
    rc = subprocess.run([MA] + cmds, capture_output=True, cwd=dc, timeout=200)
    rp = subprocess.run(PY + cmds, capture_output=True, cwd=dp, timeout=300,
                        env={**os.environ, "MODIMIZER_SCAN": "host"})
    ok = (rc.returncode == rp.returncode and flt(rc.stdout) == flt(rp.stdout)
          and flt(rc.stderr) == flt(rp.stderr))
    if ok:
        for fn in os.listdir(dc):
            a = open(f"{dc}/{fn}", "rb").read()
            pb = f"{dp}/{fn}"
            b = open(pb, "rb").read() if os.path.exists(pb) else None
            if fn.endswith(".readset") and b is not None:
                a = normalize_readset(gzip.decompress(a))
                b = normalize_readset(gzip.decompress(b))
            if a != b:
                ok = False; print(f"[{i}] FILE DIFF {fn}:", " ".join(cmds)); break
    if not ok:
        fails += 1
        print(f"[{i}] MISMATCH:", " ".join(cmds), rc.returncode, rp.returncode)
        for x, y in zip(flt(rc.stdout).splitlines(), flt(rp.stdout).splitlines()):
            if x != y:
                print("  C :", x[:130]); print("  PY:", y[:130]); break
print(f"modasm fuzz: {N - fails}/{N} chains identical")
