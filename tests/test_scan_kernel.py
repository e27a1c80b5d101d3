"""Fused Pallas scan+compact kernel vs the XLA front-end oracle
(interpret mode, small tile shapes)."""

import numpy as np
import pytest

import modimizer_tpu

modimizer_tpu.configure_jax()

import jax.numpy as jnp

from modimizer_tpu.core.seqhash import Seqhash
from modimizer_tpu.ops import scan_kernel as SK
from modimizer_tpu.ops.packed import pack_sw, mod_is_zero
from modimizer_tpu.parallel.sharded import _scan_front


def _pack32(codes, n_words):
    ext = np.zeros(n_words * 16, np.uint32)
    ext[:len(codes)] = codes[:n_words * 16]
    qq = ext.reshape(-1, 16)
    w = np.zeros(n_words, np.uint32)
    for b in range(16):
        w |= qq[:, b] << np.uint32(30 - 2 * b)
    return w


@pytest.mark.parametrize("k,w", [(16, 16), (13, 31), (16, 31), (11, 10)])
@pytest.mark.parametrize("use_pltpu_roll", [False, True])
def test_kernel_matches_oracle(k, w, use_pltpu_roll):
    sh = Seqhash.create(k, w, 17)
    rng = np.random.default_rng(42)
    blkp, T = 64, 1
    tile_w = blkp * SK.LANES
    C = 16 * tile_w * T
    codes = rng.integers(0, 4, C + 16).astype(np.uint8)
    w32 = _pack32(codes, (C + 16 + 15) // 16 + 1)
    m = C - 777
    base = np.arange(len(w32), dtype=np.int64) * 16
    v16 = np.zeros(len(w32), np.uint16)
    for r in range(16):
        v16 |= ((base + r) < m).astype(np.uint16) << np.uint16(r)
    w0, w1, vm = SK.host_layout(w32, v16, T, blkp)
    bo = min(blkp, 112)
    ok_, om_, cnt = SK.scan_compact_tiles(
        jnp.asarray(w0), jnp.asarray(w1), jnp.asarray(vm),
        k=k, w=w, factor1=sh.factor1, bo=bo, interpret=True,
        use_pltpu_roll=use_pltpu_roll)
    ok_, om_ = np.asarray(ok_), np.asarray(om_)
    cnt = np.asarray(cnt)[:, :, 0, :]

    sw64 = jnp.asarray(pack_sw(codes, C // 32 + 2))
    hashes, kmers, pos, isF = _scan_front(sw64, k=k, factor1=sh.factor1, C=C)
    emit = np.asarray(mod_is_zero(hashes, w)) & (np.asarray(pos) < m)
    want = sorted(zip(np.asarray(pos)[emit].tolist(),
                      np.asarray(kmers)[emit].tolist(),
                      np.asarray(isF)[emit].tolist()))

    live = om_ != 0xFFFFFFFF
    t_i, r_i, _s, l_i = np.nonzero(live)
    p = (om_[live] >> 1).astype(np.int64)
    isf = (om_[live] & 1) == 1
    gpos = 16 * (t_i * tile_w + p * SK.LANES + l_i) + r_i
    got = sorted(zip(gpos.tolist(), ok_[live].astype(np.uint64).tolist(),
                     isf.tolist()))
    assert got == want
    assert cnt.sum() == len(want)


def test_mod_is_zero_lemire_exact():
    """Direct check of the division-free divisibility test over random
    hashes and a spread of w (pow2 / odd / even-composite, u32 + u64)."""
    rng = np.random.default_rng(9)
    ws = [1, 2, 3, 4, 5, 6, 7, 8, 12, 16, 17, 24, 31, 32, 48, 63, 100,
          255, 1000, 65537, (1 << 20) + 7]
    h64 = rng.integers(0, 1 << 63, 4096, dtype=np.uint64) * np.uint64(2) \
        + rng.integers(0, 2, 4096, dtype=np.uint64)
    # force plenty of true positives for each w
    for w in ws:
        mult = rng.integers(0, 1 << 32, 256, dtype=np.uint64)
        hs = np.concatenate([h64, mult * np.uint64(w)])
        got = np.asarray(mod_is_zero(jnp.asarray(hs), w))
        assert np.array_equal(got, hs % np.uint64(w) == 0), f"u64 w={w}"
        h32 = hs.astype(np.uint32)
        got32 = np.asarray(mod_is_zero(jnp.asarray(h32), w))
        assert np.array_equal(got32, h32 % np.uint32(w) == 0), f"u32 w={w}"
