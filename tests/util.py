"""Shared test utilities: synthetic data + output filtering."""

import numpy as np

BASES = np.array(list("ACGT"))


def random_fasta(path, n_reads, read_len, seed=0, genome_len=0):
    """Write a random FASTA; if genome_len > 0, sample overlapping reads from
    one synthetic genome (so k-mer depths exceed 1)."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        if genome_len:
            genome = "".join(BASES[rng.integers(0, 4, size=genome_len)])
            for i in range(n_reads):
                s = int(rng.integers(0, max(1, genome_len - read_len)))
                f.write(f">read{i}\n{genome[s:s + read_len]}\n")
        else:
            for i in range(n_reads):
                seq = "".join(BASES[rng.integers(0, 4, size=read_len)])
                f.write(f">read{i}\n{seq}\n")
    return path


def random_fastq(path, n_reads, read_len, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n_reads):
            seq = "".join(BASES[rng.integers(0, 4, size=read_len)])
            qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, read_len))
            f.write(f"@q{i} desc{i}\n{seq}\n+\n{qual}\n")
    return path


def strip_timing(text: str) -> str:
    """Drop machine-dependent timing/resource lines from tool output."""
    out = []
    for line in text.splitlines(keepends=True):
        if line.startswith("user\t"):
            continue
        if line.startswith("total resources used: "):
            continue
        out.append(line)
    return "".join(out)
