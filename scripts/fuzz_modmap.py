import os, sys, subprocess, random
sys.path.insert(0, "/root/repo")
import numpy as np
from tests.golden import harness
D = "/tmp/modimizer_fuzz"
B = np.frombuffer(b"ACGT", np.uint8)
rng = np.random.default_rng(66)
g = rng.integers(0, 4, size=200000).astype(np.uint8)
with open(f"{D}/mref.fa", "w") as f:
    f.write(">c1\n" + B[g[:120000]].tobytes().decode() + "\n>c2\n"
            + B[g[120000:]].tobytes().decode() + "\n")
with open(f"{D}/mq.fa", "w") as f:
    for i in range(60):
        st = int(rng.integers(0, 195000)); L = int(rng.integers(800, 4000))
        r = g[st:st+L].copy()
        ne = rng.binomial(L, 0.02)
        if ne:
            p = rng.integers(0, L, ne); r[p] = (r[p] + rng.integers(1, 4, ne)) % 4
        if rng.integers(0, 2):
            r = (r[::-1] ^ 3).astype(np.uint8)
        f.write(f">m{i}\n{B[r].tobytes().decode()}\n")
MM = str(harness.build_tool("modmap"))
PY = [sys.executable, "/root/repo/bin/modmap"]

def flt(b):
    t = b.decode("latin1")
    return "\n".join(l for l in t.splitlines()
                     if not l.startswith("user\t") and "resources used" not in l)

R = random.Random(3)
fails = 0
N = 20
for i in range(N):
    cmds = []
    if R.random() < 0.8:
        cmds += ["-K", str(R.choice([16, 20, 24]))]
    if R.random() < 0.6:
        cmds += ["-W", str(R.choice([7, 13, 31]))]
    if R.random() < 0.5:
        cmds += ["-S", str(R.choice([3, 7, 17]))]
    cmds += ["-B", str(R.choice([22, 24]))]
    if R.random() < 0.3:
        cmds += ["-v"]
    order = R.random()
    if order < 0.7:
        cmds += ["-f", f"{D}/mref.fa"]
        if R.random() < 0.5:
            cmds += ["-w", f"idx{i}"]
        cmds += ["-q", f"{D}/mq.fa"]
        if R.random() < 0.3:
            cmds += ["-q", f"{D}/mq.fa"]
    else:
        # query with no reference or read-then-query of a prior index
        cmds += ["-q", f"{D}/mq.fa"]
    dc, dp = f"{D}/mc{i}", f"{D}/mp{i}"
    os.makedirs(dc, exist_ok=True); os.makedirs(dp, exist_ok=True)
    rc = subprocess.run([MM] + cmds, capture_output=True, cwd=dc, timeout=200)
    rp = subprocess.run(PY + cmds, capture_output=True, cwd=dp, timeout=300,
                        env={**os.environ, "MODIMIZER_SCAN": "host"})
    ok = (rc.returncode == rp.returncode and flt(rc.stdout) == flt(rp.stdout)
          and flt(rc.stderr) == flt(rp.stderr))
    if ok:
        for fn in os.listdir(dc):
            a = open(f"{dc}/{fn}", "rb").read()
            pb = f"{dp}/{fn}"
            b = open(pb, "rb").read() if os.path.exists(pb) else None
            if fn.endswith(".mod") and a != b:
                ok = False; print(f"[{i}] FILE DIFF {fn}:", " ".join(cmds)); break
    if not ok:
        fails += 1
        print(f"[{i}] MISMATCH:", " ".join(cmds), rc.returncode, rp.returncode)
        for x, y in zip(flt(rc.stdout).splitlines(), flt(rp.stdout).splitlines()):
            if x != y:
                print("  C :", x[:130]); print("  PY:", y[:130]); break
        for x, y in zip(flt(rc.stderr).splitlines(), flt(rp.stderr).splitlines()):
            if x != y:
                print("  Ce:", x[:130]); print("  Pe:", y[:130]); break
print(f"modmap fuzz: {N - fails}/{N} chains identical")
