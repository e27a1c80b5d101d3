import os, sys, subprocess
sys.path.insert(0, "/root/repo")
from tests.golden import harness
D = "/tmp/modimizer_stress"

def run(cmd, cwd):
    return subprocess.run(cmd, capture_output=True, cwd=cwd)

os.makedirs(f"{D}/c_one", exist_ok=True)
os.makedirs(f"{D}/p_one", exist_ok=True)
sc = str(harness.build_tool("seqconvert"))
# equal-length argv0 + same outfile name: the ONE provenance line records
# the full command line verbatim
if not os.path.exists("/tmp/scv_c"):
    os.symlink(sc, "/tmp/scv_c")
if not os.path.exists("/tmp/scv_p"):
    os.symlink("/root/repo/bin/seqconvert", "/tmp/scv_p")
rc = run(["/tmp/scv_c", "-1", "-Q", "0", "-o", "o.1seq", f"{D}/reads.fq"], f"{D}/c_one")
rp = run([sys.executable, "/tmp/scv_p", "-1", "-Q", "0",
          "-o", "o.1seq", f"{D}/reads.fq"], f"{D}/p_one")
assert rc.returncode in (0, -11), rc.stderr[-300:]   # documented UAF crash
assert rp.returncode == 0, rp.stderr[-300:].decode("latin1", "replace")
a = open(f"{D}/c_one/o.1seq", "rb").read().replace(b"scv_c", b"scv_p")
b = open(f"{D}/p_one/o.1seq", "rb").read()
# ONE binary footers embed a timestamp field; the golden unit test masks it.
from tests.test_onecode_parity import mask_timestamp
a2, b2 = mask_timestamp(a), mask_timestamp(b)
assert len(a2) == len(b2), (len(a2), len(b2))
assert a2 == b2, "ONE .1seq diff at scale"
print("OK seqconvert -1 (.1seq byte parity at 5 MB, Huffman-trained)")
# fasta -> ONE as well
rc = run(["/tmp/scv_c", "-1", "-o", "o2.1seq", f"{D}/reads_asm.fa"], f"{D}/c_one")
rp = run([sys.executable, "/tmp/scv_p", "-1",
          "-o", "o2.1seq", f"{D}/reads_asm.fa"], f"{D}/p_one")
assert rc.returncode in (0, -11) and rp.returncode == 0
a = mask_timestamp(open(f"{D}/c_one/o2.1seq", "rb").read().replace(b"scv_c", b"scv_p"))
b = mask_timestamp(open(f"{D}/p_one/o2.1seq", "rb").read())
assert a == b, "fasta ONE diff"
print("OK seqconvert -1 fasta (.1seq byte parity)")
