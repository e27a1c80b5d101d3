"""Golden parity tests for modrep vs the compiled reference binary."""

import difflib
import gzip
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from tests.golden import harness

pytestmark = pytest.mark.skipif(not harness.reference_available(),
                                reason="reference not available")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASES = np.array(list("ACGT"))
COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _strip_rusage(t: str) -> str:
    return re.sub(r"user\t[^\n]*", "<RUSAGE>", t)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Tandem-repeat reads with mutations and RC'd reads, plus one junk read
    LAST: its novel kmers (including mod id == ms->max) appear only in an
    orientation-rejected read, which keeps the reference's undersized per-mod
    array (modrep.c:186) in bounds so -s1 completes instead of segfaulting."""
    d = tmp_path_factory.mktemp("modrep")
    rng = np.random.default_rng(23)
    unit = "".join(BASES[rng.integers(0, 4, size=2000)])
    (d / "ref.fa").write_text(">u\n" + unit + "\n")

    def mutate(s, rate):
        a = np.frombuffer(s.encode(), np.uint8).copy()
        idx = np.nonzero(rng.random(len(a)) < rate)[0]
        a[idx] = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, len(idx))]
        return a.tobytes().decode()

    with open(d / "reads.fa", "w") as f:
        for i in range(60):
            s = mutate(unit * 5, 0.01)
            if i % 3 == 0:
                s = "".join(COMP[c] for c in reversed(s))
            f.write(f">q{i}\n{s}\n")
        f.write(">junk\n" + "".join(BASES[rng.integers(0, 4, size=3000)])
                + "\n")
    mu = harness.build_tool("modutils")
    for stem, src in (("refmod", "ref.fa"), ("readmod", "reads.fa")):
        subprocess.run([str(mu), "-c", "20", "16", "16", "17",
                        "-a", str(d / src), "-w", str(d / f"{stem}.gz")],
                       check=True, capture_output=True)
        # modrep reads .mod with plain fopen -> needs the raw stream
        (d / f"{stem}.mod").write_bytes(
            gzip.decompress((d / f"{stem}.gz").read_bytes()))
    return d


@pytest.mark.parametrize("mode", ["-s3", "-s1", "-s2"])
def test_modrep_mode(dataset, mode):
    d = dataset
    args = ["-R", str(d / "ref.fa"), str(d / "refmod.mod"),
            mode, str(d / "reads.fa"), str(d / "readmod.mod")]
    mr = harness.build_tool("modrep")
    r_c = subprocess.run([str(mr)] + args, capture_output=True, text=True)
    r_p = subprocess.run([sys.executable, os.path.join(REPO, "bin", "modrep")]
                         + args, capture_output=True, text=True)
    assert r_c.returncode == r_p.returncode == 0, (r_c.stderr, r_p.stderr)
    assert r_c.stdout == r_p.stdout, "".join(difflib.unified_diff(
        r_c.stdout.splitlines(True), r_p.stdout.splitlines(True)))[:3000]
    assert _strip_rusage(r_c.stderr) == _strip_rusage(r_p.stderr)
