import os, sys, subprocess, random
sys.path.insert(0, "/root/repo")
import numpy as np
from tests.golden import harness
D = "/tmp/modimizer_fuzz"
B = np.frombuffer(b"ACGT", np.uint8)
rng = np.random.default_rng(77)
# inputs: fasta, fastq, gzipped fasta, empty-ish, lowercase+N mix
import gzip as _gz
with open(f"{D}/s1.fa", "w") as f:
    for i in range(50):
        s = B[rng.integers(0, 4, size=int(rng.integers(30, 900)))].tobytes().decode()
        if i % 7 == 0:
            s = s.lower()
        if i % 11 == 0 and len(s) > 10:
            s = s[:5] + "NNN" + s[8:]
        f.write(f">x{i} d{i}\n{s}\n")
with open(f"{D}/s2.fq", "w") as f:
    for i in range(40):
        s = B[rng.integers(0, 4, size=200)].tobytes().decode()
        q = "".join(chr(33 + int(x)) for x in rng.integers(0, 42, 200))
        f.write(f"@y{i}\n{s}\n+\n{q}\n")
_gz.open(f"{D}/s3.fa.gz", "wb").write(open(f"{D}/s1.fa", "rb").read())
# incomplete-tail variants: the reference DROPS a final partial record with
# an 'incomplete sequence record line N' message (seqio.c:216-219)
open(f"{D}/s4.fa", "wb").write(open(f"{D}/s1.fa", "rb").read()[:-1])
open(f"{D}/s5.fq", "wb").write(
    open(f"{D}/s2.fq", "rb").read() + b"@tail\nACGT\n+\n")
TOOLS = {"composition": str(harness.build_tool("composition")),
         "seqconvert": str(harness.build_tool("seqconvert")),
         "seqhoco": str(harness.build_tool("seqhoco"))}
# equal-length argv0s: ONE-code provenance records the command line verbatim
if not os.path.exists("/tmp/scv_c"):
    os.symlink(TOOLS["seqconvert"], "/tmp/scv_c")
if not os.path.exists("/tmp/scv_p"):
    os.symlink("/root/repo/bin/seqconvert", "/tmp/scv_p")

def flt(b):
    t = b.decode("latin1")
    return "\n".join(l for l in t.splitlines()
                     if not l.startswith("user\t") and "resources used" not in l)

R = random.Random(9)
fails = 0
N = 30
for i in range(N):
    tool = R.choice(["composition", "composition", "seqconvert", "seqconvert", "seqhoco"])
    src = R.choice([f"{D}/s1.fa", f"{D}/s2.fq", f"{D}/s3.fa.gz",
                    f"{D}/s4.fa", f"{D}/s5.fq", f"{D}/nonexistent.fa"])
    if tool == "composition":
        cmds = [fl for fl in ("-b", "-q", "-l", "-t") if R.random() < 0.5] + [src]
    elif tool == "seqhoco":
        cmds = [src]
    else:
        fmt = R.choice(["-fa", "-fq", "-b", "-1"])
        cmds = [fmt]
        if R.random() < 0.4:
            cmds += ["-Q", str(R.choice([0, 20, 99]))]
        if R.random() < 0.3:
            cmds += ["-S"]
        cmds += ["-o", f"out{i}", src]
    dc, dp = f"{D}/sc{i}", f"{D}/sp{i}"
    os.makedirs(dc, exist_ok=True); os.makedirs(dp, exist_ok=True)
    if tool == "seqconvert":
        rc = subprocess.run(["/tmp/scv_c"] + cmds, capture_output=True, cwd=dc, timeout=120)
        rp = subprocess.run([sys.executable, "/tmp/scv_p"] + cmds,
                            capture_output=True, cwd=dp, timeout=200)
    else:
        rc = subprocess.run([TOOLS[tool]] + cmds, capture_output=True, cwd=dc, timeout=120)
        rp = subprocess.run([sys.executable, f"/root/repo/bin/{tool}"] + cmds,
                            capture_output=True, cwd=dp, timeout=200)
    seg = rc.returncode == -11   # documented seqconvert close-time SIGSEGV
    if tool == "seqhoco" and rc.returncode == rp.returncode == 0:
        # gzipped stdout; reference appends one garbage byte per sequence
        try:
            la = _gz.decompress(rc.stdout).decode("latin1").splitlines()
            lb = _gz.decompress(rp.stdout).decode("latin1").splitlines()
            same = len(la) == len(lb) and all(
                x == y or x[:-1] == y for x, y in zip(la, lb))
        except Exception:
            same = False
        ok = same and flt(rc.stderr) == flt(rp.stderr)
        if not ok:
            fails += 1
            print(f"[{i}] MISMATCH:", tool, " ".join(cmds))
        continue
    so_c, so_p = flt(rc.stdout), flt(rp.stdout)
    ok = ((rc.returncode == rp.returncode or (seg and rp.returncode == 0))
          and (so_c == so_p or (seg and so_p.startswith(so_c))))
    if ok and not seg:
        ok = flt(rc.stderr) == flt(rp.stderr)
    if ok and tool == "seqconvert" and not seg:
        # under SIGSEGV the reference's output-file state is undefined
        # (e.g. -b -Q on qual-less gz input crashes before flushing)
        fn = f"out{i}"
        if os.path.exists(f"{dc}/{fn}") != os.path.exists(f"{dp}/{fn}"):
            ok = False
        elif os.path.exists(f"{dc}/{fn}"):
            a = open(f"{dc}/{fn}", "rb").read(); b = open(f"{dp}/{fn}", "rb").read()
            if "-1" in cmds:
                from tests.test_onecode_parity import mask_timestamp
                ok = (mask_timestamp(a.replace(b"scv_c", b"scv_p"))
                      == mask_timestamp(b))
            else:
                ok = a == b
            if not ok:
                print(f"[{i}] FILE DIFF:", tool, " ".join(cmds), len(a), len(b))
    if not ok:
        fails += 1
        print(f"[{i}] MISMATCH:", tool, " ".join(cmds), rc.returncode, rp.returncode)
        for x, y in zip(flt(rc.stdout).splitlines(), flt(rp.stdout).splitlines()):
            if x != y:
                print("  C :", x[:120]); print("  PY:", y[:120]); break
        for x, y in zip(flt(rc.stderr).splitlines(), flt(rp.stderr).splitlines()):
            if x != y:
                print("  Ce:", x[:120]); print("  Pe:", y[:120]); break
print(f"sequtils fuzz: {N - fails}/{N} identical")
