import os, sys, subprocess
sys.path.insert(0, "/root/repo")
from tests.golden import harness
D = "/tmp/modimizer_stress"

def flt(txt):
    if isinstance(txt, bytes):
        txt = txt.decode("latin1")
    return "\n".join(l for l in txt.splitlines()
                     if not l.startswith("user\t") and "resources used" not in l)

def pair(tool, args, files=()):
    bin_c = str(harness.build_tool(tool))
    dc, dp = f"{D}/c_{tool}", f"{D}/p_{tool}"
    os.makedirs(dc, exist_ok=True); os.makedirs(dp, exist_ok=True)
    rc = subprocess.run([bin_c] + args, capture_output=True, cwd=dc)
    rp = subprocess.run([sys.executable, f"/root/repo/bin/{tool}"] + args,
                        capture_output=True, cwd=dp,
                        env={**os.environ, "MODIMIZER_SCAN": "host"})
    tag = f"{tool} {' '.join(args[:5])}"
    if tool == "seqconvert" and rc.returncode == -11:
        # documented reference bug: seqIOclose use-after-free SIGSEGVs
        # (seqconvert.c:78-81); files are complete, so compare those only
        print("  (reference seqconvert crashed with SIGSEGV as documented)")
    else:
        assert rc.returncode == rp.returncode, (tag, rc.returncode, rp.returncode, rp.stderr[-300:].decode("latin1", "replace"))
        assert flt(rc.stdout) == flt(rp.stdout), (tag, "stdout diff")
        assert flt(rc.stderr) == flt(rp.stderr), (tag, "stderr diff")
    for fn in files:
        a = open(os.path.join(dc, fn), "rb").read()
        b = open(os.path.join(dp, fn), "rb").read()
        if fn.endswith(".readset"):
            import gzip as _g
            from tests.test_modasm_parity import normalize_readset
            a = normalize_readset(_g.decompress(a))
            b = normalize_readset(_g.decompress(b))
        assert a == b, (tag, fn, "file diff", len(a), len(b))
    print("OK", tag, flush=True)

small = f"{D}/reads_asm.fa"
# full pipeline minus -u (reference cluster() is quadratic at low coverage
# and burns minutes on its own; the 20x-coverage -u case is covered by
# bench_all config 5 and test_modasm_parity)
pair("modasm", ["-m", f"{D}/A.mod", "-f", small, "-S", "-b", "-S", "-c",
                "-C", "-P", "-o1", "5", "-o2", "17", "-o3", "3", "7",
                "-a1", "4", "-w", "out"],
     files=("out.mod", "out.readset"))
pair("modasm", ["-m", f"{D}/A.mod", "-f", small, "-R", f"{D}/ref.fa",
                "-b", "-c", "-T", "3", "60", "-rb", "1", "-S"])
pair("composition", ["-b", "-q", "-l", f"{D}/reads.fq"])
pair("seqconvert", ["-fa", "-o", "c.fa", f"{D}/reads.fq"], files=("c.fa",))
pair("seqconvert", ["-b", "-Q", "25", "-o", "c.bin", f"{D}/reads.fq"],
     files=("c.bin",))
# seqhoco: the reference appends one uninitialized-heap byte per sequence
# (seqhoco.c:31 reads one past the end); compare modulo that garbage byte
import gzip as _gz
bin_c = str(harness.build_tool("seqhoco"))
rc = subprocess.run([bin_c, f"{D}/reads.fa"], capture_output=True)
rp = subprocess.run([sys.executable, "/root/repo/bin/seqhoco", f"{D}/reads.fa"],
                    capture_output=True)
la = _gz.decompress(rc.stdout).decode("latin1").splitlines()
lb = _gz.decompress(rp.stdout).decode("latin1").splitlines()
assert len(la) == len(lb)
njunk = 0
for x, y in zip(la, lb):
    if x == y:
        continue
    assert x[:-1] == y, (x[-60:], y[-60:])
    njunk += 1
print(f"OK seqhoco ({njunk} reference trailing-garbage bytes tolerated)")
print("ALL STRESS OK", flush=True)
