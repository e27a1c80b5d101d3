import os, sys, subprocess, random
sys.path.insert(0, "/root/repo")
import numpy as np
from tests.golden import harness
D = "/tmp/modimizer_fuzz_rep"
os.makedirs(D, exist_ok=True)
B = np.frombuffer(b"ACGT", np.uint8)
MR = str(harness.build_tool("modrep"))

def flt(b):
    t = b.decode("latin1")
    return "\n".join(l for l in t.splitlines()
                     if not l.startswith("user\t") and "resources used" not in l)

R = random.Random(17)
fails = 0
N = 12
for i in range(N):
    rng = np.random.default_rng(1000 + i)
    ulen = R.choice([800, 2000, 4000])
    ncopy = R.choice([3, 5, 9])
    nreads = R.choice([30, 80, 150])
    mrate = R.choice([0.002, 0.01, 0.03])
    unit = B[rng.integers(0, 4, size=ulen)].tobytes().decode()
    with open(f"{D}/ref{i}.fa", "w") as f:
        f.write(">u\n" + unit + "\n")
    with open(f"{D}/r{i}.fa", "w") as f:
        for j in range(nreads):
            a = np.frombuffer((unit * ncopy).encode(), np.uint8).copy()
            idx = np.nonzero(rng.random(len(a)) < mrate)[0]
            a[idx] = B[rng.integers(0, 4, len(idx))]
            f.write(f">t{j}\n{a.tobytes().decode()}\n")
        if R.random() < 0.5:
            f.write(">junk\n" + B[rng.integers(0, 4, size=ulen)].tobytes().decode() + "\n")
    mode = R.choice(["-s1", "-s2", "-s3"])
    args = ["-R", f"{D}/ref{i}.fa", mode, f"{D}/r{i}.fa"]
    rc = subprocess.run([MR] + args, capture_output=True, cwd=D, timeout=200)
    rp = subprocess.run([sys.executable, "/root/repo/bin/modrep"] + args,
                        capture_output=True, cwd=D, timeout=300,
                        env={**os.environ, "MODIMIZER_SCAN": "host"})
    ok = (rc.returncode == rp.returncode and flt(rc.stdout) == flt(rp.stdout)
          and flt(rc.stderr) == flt(rp.stderr))
    if not ok:
        fails += 1
        print(f"[{i}] MISMATCH ulen={ulen} ncopy={ncopy} n={nreads} mrate={mrate} {mode}",
              rc.returncode, rp.returncode)
        for x, y in zip(flt(rc.stdout).splitlines(), flt(rp.stdout).splitlines()):
            if x != y:
                print("  C :", x[:130]); print("  PY:", y[:130]); break
print(f"modrep fuzz: {N - fails}/{N} identical")
