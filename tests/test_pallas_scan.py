"""Pallas fused scan kernel: interpret-mode exactness vs the oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modimizer_tpu.core.seqhash import Seqhash
from modimizer_tpu.ops.packed import pack_bits
from modimizer_tpu.ops.pallas_scan import (BLK, TILE, pack_sw32,
                                           scan_compact_pallas,
                                           sw_block_rows)


@pytest.mark.parametrize("k,w", [(16, 16), (12, 31), (9, 5)])
def test_pallas_scan_matches_oracle(k, w):
    sh = Seqhash.create(k, w, 17)
    rng = np.random.default_rng(4)
    C = TILE
    codes = rng.integers(0, 4, size=C + k - 1).astype(np.uint8)
    valid = np.ones(C, bool)
    valid[100:200] = False  # exercise the validity bits
    sw = jnp.asarray(sw_block_rows(pack_sw32(codes, C // 16 + 2), C // BLK))
    vb = jnp.asarray(pack_bits(valid, C // 64).view(np.uint32)
                     .reshape(C // BLK, 16))
    ok, op, ne, ov = scan_compact_pallas(sw, vb, k=k, w=w,
                                         factor1=sh.factor1, C=C, bo=128,
                                         interpret=True)
    ok, op, ne, ov = map(np.asarray, (ok, op, ne, ov))
    km, hs, _f = sh.scan(codes)
    sel = ((hs[:C] % np.uint64(w)) == 0) & valid
    want = sorted(zip(np.nonzero(sel)[0].tolist(), km[:C][sel].tolist()))
    real = ok != 0xFFFFFFFFFFFFFFFF
    got = sorted(zip(op[real].tolist(), ok[real].tolist()))
    assert int(ne) == len(want)
    assert not bool(ov)
    assert got == want
