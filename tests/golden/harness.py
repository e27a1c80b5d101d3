"""Golden-output harness: compile the unmodified reference C tools and run them.

The reference ships no tests (SURVEY.md section 4); its compiled binaries are our
parity oracle.  We compile straight from /root/reference (read-only) into a
cache dir, adding only a funopen->fopencookie shim so the BSD-flavoured
utils.c:fzopen links on Linux.  No reference source is copied into this repo.
"""

import hashlib
import os
import subprocess
from pathlib import Path

REF = Path(os.environ.get("MODIMIZER_REF", "/root/reference"))
CACHE = Path(os.environ.get("MODIMIZER_GOLDEN_CACHE", "/tmp/modimizer_golden"))
SHIM = Path(__file__).with_name("funopen_shim.c")
SHIM_H = Path(__file__).with_name("funopen_shim.h")

_CORE = ["seqio.c", "seqhash.c", "modset.c", "hash.c", "dict.c", "array.c", "utils.c"]

# seqio is compiled -DONEIO against the vendored ONElib (Makefile:26-29), so
# the seq tools read/write .1seq like the released binaries; modtype links
# ONElib directly (Makefile:65-66)
_TOOL_SOURCES = {
    "modutils": ["modutils.c", "ONElib.c"] + _CORE,
    "modmap": ["modmap.c", "ONElib.c"] + _CORE,
    "modasm": ["modasm.c", "ONElib.c"] + _CORE,
    "modrep": ["modrep.c", "ONElib.c"] + _CORE,
    "modtype": ["modtype.c", "ONElib.c"] + _CORE,
    "composition": ["composition.c", "ONElib.c"] + _CORE,
    "seqconvert": ["seqconvert.c", "ONElib.c"] + _CORE,
    "seqhoco": ["seqhoco.c", "ONElib.c"] + _CORE,
}


def reference_available() -> bool:
    return REF.is_dir() and (REF / "modset.c").exists()


def _stamp() -> str:
    h = hashlib.sha256()
    for src in sorted(set(sum(_TOOL_SOURCES.values(), []))):
        h.update((REF / src).read_bytes())
    h.update(SHIM.read_bytes())
    h.update(SHIM_H.read_bytes())
    return h.hexdigest()[:16]


def build_tool(name: str) -> Path:
    """Compile one reference tool (cached); returns the binary path."""
    CACHE.mkdir(parents=True, exist_ok=True)
    stamp = _stamp()
    exe = CACHE / f"{name}-{stamp}"
    if exe.exists():
        return exe
    shim_o = CACHE / f"funopen_shim-{stamp}.o"
    if not shim_o.exists():
        # The shim needs _GNU_SOURCE feature macros of its own, so it is
        # compiled separately, without the -include prototype header.
        subprocess.run(["gcc", "-O2", "-w", "-c", "-o", str(shim_o), str(SHIM)],
                       check=True, capture_output=True)
    srcs = [str(REF / s) for s in _TOOL_SOURCES[name]] + [str(shim_o)]
    cmd = (["gcc", "-O2", "-w", "-DONEIO", "-include", str(SHIM_H),
            "-o", str(exe)] + srcs + ["-lz", "-lm", "-lpthread"])
    subprocess.run(cmd, check=True, capture_output=True)
    return exe


def run_tool(name: str, args, cwd=None, check=True):
    """Run a reference tool; returns CompletedProcess (text mode off)."""
    exe = build_tool(name)
    return subprocess.run([str(exe)] + [str(a) for a in args],
                          capture_output=True, cwd=cwd, check=check)


def build_one_driver() -> Path:
    """Compile the ONElib oracle driver (tests/golden/one_driver.c) against
    the reference's vendored ONElib.c."""
    CACHE.mkdir(parents=True, exist_ok=True)
    src = Path(__file__).parent / "one_driver.c"
    h = hashlib.sha256(src.read_bytes())
    h.update((REF / "ONElib.c").read_bytes())
    exe = CACHE / f"one_driver-{h.hexdigest()[:16]}"
    if not exe.exists():
        subprocess.run(
            ["gcc", "-O2", "-w", "-I", str(REF), "-o", str(exe), str(src),
             str(REF / "ONElib.c"), "-lz", "-lm", "-lpthread"],
            check=True, capture_output=True)
    return exe
