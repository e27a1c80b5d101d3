"""Multi-chip sharded modset construction (the reference has no distributed
layer at all — SURVEY.md section 2.3; this subsystem is green-field TPU design).

Mesh design: one logical axis ``shard``.  Every device plays both roles:

  1. *data / sequence parallel*: each device scans its slice of the 2-bit
     packed read stream (with a k-1 halo) using the same position-parallel
     extraction as ops/seqhash.py;
  2. *table parallel*: the k-mer multiset is partitioned by a hash prefix;
     emitted kmers are routed to their owner shard with ``all_to_all`` over
     ICI, and each shard maintains a sorted (kmer, depth, first-position)
     state merged by device sort + segment-reduce.

Reduction semantics implement exactly the reference's merge math: depth is a
saturating U16 add (modutils.c:26, modset.c:122); the *first-encounter stream
position* is min-reduced so the canonical host table (first-encounter ids,
modset.c:57) can be replayed exactly after a final gather — the parallel
build is bit-reproducible against the sequential one.

Host->device traffic is 0.25 B/base (packed stream) + 1/8 B/base (validity
bits); per-step device->host traffic is two scalars.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.packed import (canonical_hashes, derive_tw, expand_bits,
                          extract_kmers, pack_bits, pack_sw)

try:
    def shard_map(f, mesh, in_specs, out_specs):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs)
    jax.shard_map  # noqa: B018
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm

    def shard_map(f, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

U64_SENTINEL = jnp.uint64(0xFFFFFFFFFFFFFFFF)
POS_INF = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def build_mesh(n_devices=None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), ("shard",))


def _split64(x):
    return ((x >> jnp.uint64(32)).astype(jnp.uint32),
            (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))


def _join64(hi, lo):
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def sort_u64_with_payload(keys, *payloads):
    """Sort u64 keys (ascending) with payloads via 2x u32 lexicographic keys
    (portable: avoids emulated-64-bit comparators inside lax.sort)."""
    hi, lo = _split64(keys)
    payload32 = []
    shapes = []
    for p in payloads:
        if p.dtype == jnp.uint64:
            ph, pl = _split64(p)
            payload32 += [ph, pl]
            shapes.append("u64")
        else:
            payload32.append(p)
            shapes.append(None)
    out = jax.lax.sort((hi, lo, *payload32), num_keys=2)
    keys_s = _join64(out[0], out[1])
    res = []
    i = 2
    for s in shapes:
        if s == "u64":
            res.append(_join64(out[i], out[i + 1]))
            i += 2
        else:
            res.append(out[i])
            i += 1
    return (keys_s, *res)


def _merge_sorted_state(state_k, state_d, state_m, in_k, in_d, in_m, S):
    """Merge incoming (kmer, depth, minpos) into sorted fixed-size state.

    state_k sorted ascending with U64_SENTINEL padding.  Returns new state +
    overflow flag.  Depth saturates at U16MAX."""
    allk = jnp.concatenate([state_k, in_k])
    alld = jnp.concatenate([state_d, in_d])
    allm = jnp.concatenate([state_m, in_m])
    k_s, d_s, m_s = sort_u64_with_payload(allk, alld, allm)
    n = k_s.shape[0]
    first = jnp.concatenate([jnp.array([True]), k_s[1:] != k_s[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    depth = jax.ops.segment_sum(d_s, seg, num_segments=n)
    depth = jnp.minimum(depth, jnp.uint32(0xFFFF))
    minpos = jax.ops.segment_min(m_s, seg, num_segments=n)
    head_slot = jnp.where(first & (k_s != U64_SENTINEL), seg, S)
    new_k = jnp.full(S, U64_SENTINEL, jnp.uint64).at[head_slot].set(
        k_s, mode="drop")
    new_d = jnp.zeros(S, jnp.uint32).at[head_slot].set(depth[seg], mode="drop")
    new_m = jnp.full(S, POS_INF, jnp.uint64).at[head_slot].set(
        minpos[seg], mode="drop")
    n_unique = jnp.sum(first & (k_s != U64_SENTINEL)).astype(jnp.int32)
    overflow = n_unique > S
    return new_k, new_d, new_m, overflow


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "factor1", "cap", "n_shards",
                                    "S", "C", "mesh"))
def sharded_build_step(state_k, state_d, state_m, sw, vbits, gpos_base,
                       *, k, w, factor1, cap, n_shards, S, C, mesh):
    """One sharded build step over the mesh.

    state_*: [n_shards, S]; sw: u64 [n_shards, C/32 + 2] packed stream with
    halo; vbits: u64 [n_shards, C/64] validity bits; gpos_base: u64
    [n_shards] global stream position of each device's slice."""

    def step(sk, sd, sm, sw_l, vb_l, base_l):
        sk, sd, sm = sk[0], sd[0], sm[0]
        sw_l, vb_l, base_l = sw_l[0], vb_l[0], base_l[0]
        tw_l = derive_tw(sw_l)
        h, hrc = extract_kmers(sw_l, tw_l, k, C)
        hashes, kmers, _isF = canonical_hashes(h, hrc, k, factor1)
        valid = expand_bits(vb_l, C)
        emit = valid & ((hashes % jnp.uint64(w)) == jnp.uint64(0))
        owner = ((hashes // jnp.uint64(w)) % jnp.uint64(n_shards)).astype(
            jnp.uint32)

        # group emitted kmers by owner (stream order within groups)
        key = jnp.where(emit, owner, jnp.uint32(n_shards))
        order = jnp.argsort(key, stable=True)
        so = key[order]
        km_o = kmers[order]
        gpos = base_l + jnp.arange(C, dtype=jnp.uint64)
        gp_o = gpos[order]
        group_start = jnp.searchsorted(so, jnp.arange(n_shards,
                                                      dtype=jnp.uint32))
        rank = jnp.arange(C) - group_start[jnp.minimum(so, n_shards - 1)]
        ok = (so < n_shards) & (rank < cap)
        slot = jnp.where(ok, so.astype(jnp.int32) * cap +
                         rank.astype(jnp.int32), n_shards * cap)
        send_k = jnp.full(n_shards * cap, U64_SENTINEL, jnp.uint64
                          ).at[slot].set(km_o, mode="drop")
        send_p = jnp.full(n_shards * cap, POS_INF, jnp.uint64
                          ).at[slot].set(gp_o, mode="drop")
        send_overflow = jnp.any((so < n_shards) & (rank >= cap))

        recv_k = jax.lax.all_to_all(send_k.reshape(n_shards, cap), "shard",
                                    split_axis=0, concat_axis=0, tiled=True)
        recv_p = jax.lax.all_to_all(send_p.reshape(n_shards, cap), "shard",
                                    split_axis=0, concat_axis=0, tiled=True)
        in_k = recv_k.reshape(-1)
        in_p = recv_p.reshape(-1)
        in_d = jnp.where(in_k != U64_SENTINEL, jnp.uint32(1), jnp.uint32(0))

        nk, nd, nm, merge_overflow = _merge_sorted_state(
            sk, sd, sm, in_k, in_d, in_p, S)
        n_emit = jnp.sum(emit).astype(jnp.int64)
        return (nk[None], nd[None], nm[None],
                (merge_overflow | send_overflow)[None], n_emit[None])

    f = shard_map(step, mesh,
                  in_specs=(P("shard"), P("shard"), P("shard"),
                            P("shard"), P("shard"), P("shard")),
                  out_specs=(P("shard"), P("shard"), P("shard"),
                             P("shard"), P("shard")))
    return f(state_k, state_d, state_m, sw, vbits, gpos_base)


class ShardedModsetBuilder:
    """Host driver: feeds packed stream chunks to the mesh, keeps sharded
    state, finalizes into the exact first-encounter insertion stream."""

    def __init__(self, sh, mesh: Mesh, chunk_per_dev=1 << 22,
                 state_size=1 << 23, cap=None, max_state_size=1 << 28):
        self.sh = sh
        self.mesh = mesh
        self.n = mesh.devices.size
        # chunk must be a multiple of 64 for bit packing alignment
        self.chunk = max(64, (chunk_per_dev // 64) * 64)
        self.S = state_size
        self.max_S = max_state_size
        self.cap = cap or int(max(1024, 4 * self.chunk / sh.w))
        n, S = self.n, self.S
        self.state_k = jnp.full((n, S), U64_SENTINEL, jnp.uint64)
        self.state_d = jnp.zeros((n, S), jnp.uint32)
        self.state_m = jnp.full((n, S), POS_INF, jnp.uint64)
        self.total_emitted = 0
        self._pending = []   # (snapshot_state, inputs, outputs)

    def _grow(self, new_S):
        """Pad the sorted state to a bigger capacity (sentinels sort last)."""
        if new_S > self.max_S:
            raise RuntimeError("sharded modset state exceeds max_state_size")
        n = self.n
        pad = new_S - self.S
        self.state_k = jnp.concatenate(
            [self.state_k, jnp.full((n, pad), U64_SENTINEL, jnp.uint64)], 1)
        self.state_d = jnp.concatenate(
            [self.state_d, jnp.zeros((n, pad), jnp.uint32)], 1)
        self.state_m = jnp.concatenate(
            [self.state_m, jnp.full((n, pad), POS_INF, jnp.uint64)], 1)
        self.S = new_S

    def _step(self, sw, vb, gpos):
        sh = self.sh
        return sharded_build_step(
            self.state_k, self.state_d, self.state_m, sw, vb, gpos,
            k=sh.k, w=sh.w, factor1=sh.factor1, cap=self.cap,
            n_shards=self.n, S=self.S, C=self.chunk, mesh=self.mesh)

    def _drain(self, force=False, window=2):
        """Retire pending steps; on overflow, roll back to the snapshot,
        grow the state, and replay the pending inputs synchronously."""
        while self._pending and (force or len(self._pending) > window):
            snapshot, inputs, out = self._pending.pop(0)
            overflow = bool(np.any(np.asarray(out[3])))
            if not overflow:
                self.total_emitted += int(np.asarray(out[4]).sum())
                continue
            # rollback: discard this and all later pending results
            replay = [inputs] + [p[1] for p in self._pending]
            self._pending = []
            self.state_k, self.state_d, self.state_m = snapshot
            self._grow(self.S * 2)
            for inp in replay:
                out = self._step(*inp)
                while bool(np.any(np.asarray(out[3]))):
                    self._grow(self.S * 2)
                    out = self._step(*inp)
                self.state_k, self.state_d, self.state_m = out[:3]
                self.total_emitted += int(np.asarray(out[4]).sum())

    def feed_stream(self, codes: np.ndarray, offsets: np.ndarray,
                    base: int = 0):
        """Chunk a flat host stream across devices and feed until consumed."""
        from ..ops.seqhash import _validity
        sh = self.sh
        k = sh.k
        n_total = len(codes)
        codes = np.ascontiguousarray(codes).view(np.uint8)
        valid_all = _validity(np.asarray(offsets, np.int64), n_total, k)
        C = self.chunk
        NW = C // 32
        super_chunk = self.n * C
        for s in range(0, max(n_total, 1), super_chunk):
            sw = np.zeros((self.n, NW + 2), np.uint64)
            vb = np.zeros((self.n, C // 64), np.uint64)
            for d in range(self.n):
                st = s + d * C
                if st >= n_total:
                    break
                seg = codes[st:st + C + k - 1]
                sw[d] = pack_sw(seg, NW + 2)
                m = min(C, n_total - st)
                vb[d] = pack_bits(valid_all[st:st + m], C // 64)
            gpos = jnp.asarray(
                np.uint64(base + s) +
                np.arange(self.n, dtype=np.uint64) * np.uint64(C))
            inputs = (jnp.asarray(sw), jnp.asarray(vb), gpos)
            snapshot = (self.state_k, self.state_d, self.state_m)
            out = self._step(*inputs)
            self.state_k, self.state_d, self.state_m = out[:3]
            self._pending.append((snapshot, inputs, out))
            self._drain()
        self._drain(force=True)

    def finalize(self):
        """Gather shards and return (kmers, counts) in first-encounter order —
        identical to the sequential build's insertion stream."""
        self._drain(force=True)
        ks = np.asarray(self.state_k).reshape(-1)
        ds = np.asarray(self.state_d).reshape(-1)
        ms = np.asarray(self.state_m).reshape(-1)
        real = ks != 0xFFFFFFFFFFFFFFFF
        ks, ds, ms = ks[real], ds[real], ms[real]
        order = np.argsort(ms, kind="stable")
        return ks[order], np.minimum(ds[order], 0xFFFF).astype(np.uint32)


# ------------------------------------------------------------------
# sharded modset merge: modutils -m / modsetMerge (modset.c:106-128)
# distributed by hash prefix over the mesh
# ------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_shards", "cap", "factor1",
                                             "mesh"))
def sharded_merge_step(kmers, depth, info, rank, src_b, *, n_shards, cap,
                       factor1, mesh):
    """Route (kmer, depth, info, rank, isB) by hash prefix; per shard reduce
    with the reference's exact merge math:
      depth: saturating U16 add (modset.c:122)
      info:  A-only keeps full info; A+B -> (infoA & 3) | min(cA+cB, 3)
             with flag bits cleared (modset.c:124-125); B-only -> copyB
      rank:  min (first-encounter order of the replayed insertion stream)

    Inputs are [n_shards, cap] padded with U64_SENTINEL kmers.  Returns
    per-shard reduced arrays (still [n_shards, cap], sentinel-padded,
    sorted by kmer) plus a per-shard overflow flag.
    """

    def step(km, dp, nf, rk, sb):
        km, dp, nf, rk, sb = km[0], dp[0], nf[0], rk[0], sb[0]
        n = km.shape[0]
        # owner by low bits of the kmer itself: uniform and hash-free is fine
        # here since routing only needs a balanced deterministic partition
        owner = (km % jnp.uint64(n_shards)).astype(jnp.uint32)
        key = jnp.where(km != U64_SENTINEL, owner, jnp.uint32(n_shards))
        order = jnp.argsort(key, stable=True)
        so = key[order]
        group_start = jnp.searchsorted(so, jnp.arange(n_shards,
                                                      dtype=jnp.uint32))
        rank_in = jnp.arange(n) - group_start[jnp.minimum(so, n_shards - 1)]
        ok = (so < n_shards) & (rank_in < cap)
        slot = jnp.where(ok, so.astype(jnp.int32) * cap +
                         rank_in.astype(jnp.int32), n_shards * cap)

        def scatter(v, fill, dt):
            return jnp.full(n_shards * cap, fill, dt).at[slot].set(
                v[order], mode="drop")

        send_k = scatter(km, U64_SENTINEL, jnp.uint64)
        send_d = scatter(dp, 0, jnp.uint32)
        send_i = scatter(nf, 0, jnp.uint32)
        send_r = scatter(rk, POS_INF, jnp.uint64)
        send_b = scatter(sb, 0, jnp.uint32)
        overflow = jnp.any((so < n_shards) & (rank_in >= cap))

        def a2a(x):
            return jax.lax.all_to_all(x.reshape(n_shards, cap), "shard",
                                      split_axis=0, concat_axis=0,
                                      tiled=True).reshape(-1)

        rk_k, rk_d, rk_i = a2a(send_k), a2a(send_d), a2a(send_i)
        rk_r, rk_b = a2a(send_r), a2a(send_b)

        # reduce per kmer: at most one A and one B contributor
        k_s, d_s, i_s, r_s, b_s = sort_u64_with_payload(rk_k, rk_d, rk_i,
                                                        rk_r, rk_b)
        m = k_s.shape[0]
        first = jnp.concatenate([jnp.array([True]), k_s[1:] != k_s[:-1]])
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        live = k_s != U64_SENTINEL
        depth_sum = jax.ops.segment_sum(jnp.where(live, d_s, 0), seg, m)
        depth_sum = jnp.minimum(depth_sum, jnp.uint32(0xFFFF))
        n_contrib = jax.ops.segment_sum(live.astype(jnp.int32), seg, m)
        info_a = jax.ops.segment_max(jnp.where(live & (b_s == 0), i_s, 0),
                                     seg, m)
        info_b = jax.ops.segment_max(jnp.where(live & (b_s == 1), i_s, 0),
                                     seg, m)
        rank_min = jax.ops.segment_min(jnp.where(live, r_s, POS_INF), seg, m)
        has_a = jax.ops.segment_max((live & (b_s == 0)).astype(jnp.int32),
                                    seg, m)
        c_sum = jnp.minimum((info_a & 3) + (info_b & 3), jnp.uint32(3))
        info_both = (info_a & jnp.uint32(3)) | c_sum
        info_out = jnp.where(n_contrib > 1, info_both,
                             jnp.where(has_a == 1, info_a, info_b & 3))

        out_slot = jnp.where(first & live, seg, m)
        S = n_shards * cap
        ok2 = jnp.full(S, U64_SENTINEL, jnp.uint64).at[out_slot].set(
            k_s, mode="drop")[:S]
        od = jnp.zeros(S, jnp.uint32).at[out_slot].set(depth_sum[seg],
                                                       mode="drop")[:S]
        oi = jnp.zeros(S, jnp.uint32).at[out_slot].set(info_out[seg],
                                                       mode="drop")[:S]
        orr = jnp.full(S, POS_INF, jnp.uint64).at[out_slot].set(
            rank_min[seg], mode="drop")[:S]
        return (ok2[None], od[None], oi[None], orr[None], overflow[None])

    f = shard_map(step, mesh,
                  in_specs=(P("shard"),) * 5,
                  out_specs=(P("shard"),) * 5)
    return f(kmers, depth, info, rank, src_b)


def sharded_merge(ms1, ms2, mesh: Mesh):
    """Device-accelerated modsetMerge: returns (kmers, depth, info) in the
    exact first-encounter order the sequential merge produces (ms1's ids,
    then ms2's new kmers in ms2 id order).  The caller replays them into a
    canonical Modset table.  Returns None when the hashers differ, like
    modsetMerge (modset.c:110-111)."""
    s1, s2 = ms1.hasher, ms2.hasher
    if s1.w != s2.w or s1.k != s2.k or s1.factor1 != s2.factor1:
        return None
    n = mesh.devices.size
    n1, n2 = ms1.max, ms2.max
    total = n1 + n2
    cap = max(1024, -(-total // n))  # per-shard slot budget
    pad = n * cap - total

    kmers = np.concatenate([ms1.value[1:n1 + 1], ms2.value[1:n2 + 1],
                            np.full(pad, 0xFFFFFFFFFFFFFFFF, np.uint64)])
    depth = np.concatenate([ms1.depth[1:n1 + 1], ms2.depth[1:n2 + 1],
                            np.zeros(pad, np.uint16)]).astype(np.uint32)
    info = np.concatenate([ms1.info[1:n1 + 1], ms2.info[1:n2 + 1],
                           np.zeros(pad, np.uint8)]).astype(np.uint32)
    rank = np.concatenate([np.arange(total, dtype=np.uint64),
                           np.full(pad, 0xFFFFFFFFFFFFFFFF, np.uint64)])
    src_b = np.concatenate([np.zeros(n1, np.uint32), np.ones(n2, np.uint32),
                            np.zeros(pad, np.uint32)])

    def shard2d(a):
        return jnp.asarray(a.reshape(n, cap))

    out = sharded_merge_step(shard2d(kmers), shard2d(depth), shard2d(info),
                             shard2d(rank), shard2d(src_b),
                             n_shards=n, cap=cap, factor1=s1.factor1,
                             mesh=mesh)
    ok = np.asarray(out[0]).reshape(-1)
    od = np.asarray(out[1]).reshape(-1)
    oi = np.asarray(out[2]).reshape(-1)
    orr = np.asarray(out[3]).reshape(-1)
    if bool(np.any(np.asarray(out[4]))):
        raise RuntimeError("sharded merge shard overflow; raise cap")
    real = ok != 0xFFFFFFFFFFFFFFFF
    ok, od, oi, orr = ok[real], od[real], oi[real], orr[real]
    order = np.argsort(orr, kind="stable")
    return (ok[order], np.minimum(od[order], 0xFFFF).astype(np.uint16),
            oi[order].astype(np.uint8))
