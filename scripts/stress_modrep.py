import os, sys, subprocess
sys.path.insert(0, "/root/repo")
import numpy as np
from tests.golden import harness
D = "/tmp/modimizer_stress_rep"
os.makedirs(D, exist_ok=True)
B = np.frombuffer(b"ACGT", np.uint8)
rng = np.random.default_rng(91)
unit = B[rng.integers(0, 4, size=6000)].tobytes().decode()

def mutate(s, rate):
    a = np.frombuffer(s.encode(), np.uint8).copy()
    idx = np.nonzero(rng.random(len(a)) < rate)[0]
    a[idx] = B[rng.integers(0, 4, len(idx))]
    return a.tobytes().decode()

with open(f"{D}/ref.fa", "w") as f:
    f.write(">u\n" + unit + "\n")
with open(f"{D}/reads.fa", "w") as f:
    for i in range(400):
        f.write(f">t{i}\n{mutate(unit * 8, 0.01)}\n")
    f.write(">junk\n" + B[rng.integers(0, 4, size=9000)].tobytes().decode() + "\n")

def flt(b):
    t = b.decode("latin1")
    return "\n".join(l for l in t.splitlines()
                     if not l.startswith("user\t") and "resources used" not in l)

mr = str(harness.build_tool("modrep"))
for mode in ("-s1", "-s2", "-s3"):
    rc = subprocess.run([mr, "-R", f"{D}/ref.fa", mode, f"{D}/reads.fa"],
                        capture_output=True, cwd=D)
    rp = subprocess.run([sys.executable, "/root/repo/bin/modrep", "-R",
                         f"{D}/ref.fa", mode, f"{D}/reads.fa"],
                        capture_output=True, cwd=D,
                        env={**os.environ, "MODIMIZER_SCAN": "host"})
    assert rc.returncode == rp.returncode, (mode, rc.returncode, rp.returncode,
                                            rp.stderr[-300:])
    assert flt(rc.stdout) == flt(rp.stdout), (mode, "stdout diff")
    print("OK modrep", mode, flush=True)
print("MODREP STRESS OK")
