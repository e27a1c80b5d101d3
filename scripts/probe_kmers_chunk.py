"""Time the kmers-only e2e chunk program (_scan_chunk_kmers — the
fused@posmajor=True stream-order path used by modutils -a / bench e2e) on
device-resident data.  BLK rides MODIMIZER_BLK (import-time), so A/B runs
are separate processes:

    MODIMIZER_BLK=512 python scripts/probe_kmers_chunk.py [C_log2]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import modimizer_tpu  # noqa: F401

import jax.numpy as jnp

from modimizer_tpu.core.seqhash import Seqhash
from modimizer_tpu.ops.packed import pack_bits, pack_sw
from modimizer_tpu.ops.device_scan import _scan_chunk_kmers
from modimizer_tpu.ops.seqhash import BLK_COMPACT, scan_bo

K, W, SEED = 16, 16, 17
C_LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 25
REPS = 8
BATCHES = 3


def main():
    sh = Seqhash.create(K, W, SEED)
    C = 1 << C_LOG2
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, C + K - 1).astype(np.uint8)
    sw = jnp.asarray(pack_sw(codes, C // 32 + 2))
    vb = jnp.asarray(pack_bits(np.ones(C, bool), C // 64))
    bo = scan_bo(W)
    cap = C // W + (C // W) // 4 + 4096
    kw = dict(k=K, w=W, factor1=sh.factor1, bo=bo, cap=cap)
    t0 = time.perf_counter()
    out = _scan_chunk_kmers(sw, vb, **kw)
    tot = int(np.asarray(out[1]))
    t_compile = time.perf_counter() - t0
    best = None
    for _ in range(BATCHES):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = _scan_chunk_kmers(sw, vb, **kw)
        tot = int(np.asarray(out[1]))
        dt = (time.perf_counter() - t0) / REPS
        best = dt if best is None else min(best, dt)
    print(f"BLK={BLK_COMPACT} bo={bo}: {best*1e3:.2f} ms/chunk of 2^{C_LOG2}"
          f" = {C/best/1e6:.0f} Mpos/s  (compile {t_compile:.1f}s,"
          f" {tot} kmers, backend {os.environ.get('MODIMIZER_COMPACT','-')})")


if __name__ == "__main__":
    main()
