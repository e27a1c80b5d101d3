"""Device (TPU) modimizer scan: the framework's flagship compute kernel.

Re-design of the reference's sequential rolling iterator (seqhash.c:154-196)
as a position-parallel XLA computation:

- Reads are ingested as one flat base-code stream plus offsets (SeqBatch);
  k-mers never cross read boundaries, enforced by a validity mask — no
  per-read padding, no dynamic shapes.
- The stream is processed in fixed-size chunks with a (k-1)-base halo so
  every position is computed exactly once (the basis for sequence/context
  parallelism across chips as well: SURVEY.md section 2.3).
- For each position p: forward kmer h (2k bits), reverse-complement kmer hRC,
  multiplicative hashes (u64, emulated on the 32-bit VPU), canonical
  min-direction, and the ``hash % w == 0`` modimizer filter.
- Matches are compacted on device (cumsum + scatter) so only ~N/w values
  cross the PCIe link.

All math matches seqhash.h:58 / seqhash.c:60-79 bit-for-bit.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.seqhash import Seqhash

DEFAULT_CHUNK = 1 << 22  # 4 Mbase per device dispatch


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _scan_chunk(codes, valid, start_gpos, k, w, factor1, cap):
    """One chunk: codes [C+k-1] u8, valid [C] bool -> compacted matches.

    Returns (kmers u64[cap], gpos i64[cap], isF bool[cap], count i32).
    """
    C = codes.shape[0] - (k - 1)
    c = codes.astype(jnp.uint64)
    h = jnp.zeros(C, jnp.uint64)
    hrc = jnp.zeros(C, jnp.uint64)
    for j in range(k):
        cj = jax.lax.dynamic_slice(c, (j,), (C,))
        h = (h << jnp.uint64(2)) | cj
        hrc = hrc | ((jnp.uint64(3) - cj) << jnp.uint64(2 * j))
    f1 = jnp.uint64(factor1)
    shift1 = jnp.uint64(64 - 2 * k)
    hf = (h * f1) >> shift1
    hr = (hrc * f1) >> shift1
    isF = hf < hr
    hashes = jnp.where(isF, hf, hr)
    kmers = jnp.where(isF, h, hrc)
    emit = valid & (hashes % jnp.uint64(w) == jnp.uint64(0))

    idx = jnp.cumsum(emit.astype(jnp.int32)) - 1
    count = idx[-1] + 1
    slot = jnp.where(emit, idx, cap)  # out-of-range -> dropped
    out_k = jnp.zeros(cap, jnp.uint64).at[slot].set(kmers, mode="drop")
    gpos = start_gpos + jnp.arange(C, dtype=jnp.int64)
    out_p = jnp.zeros(cap, jnp.int64).at[slot].set(gpos, mode="drop")
    out_f = jnp.zeros(cap, jnp.bool_).at[slot].set(isF, mode="drop")
    return out_k, out_p, out_f, count


def _validity(offsets: np.ndarray, n: int, k: int) -> np.ndarray:
    """valid[p] = True iff the k-mer starting at stream position p lies fully
    inside one read.  Computed from the ragged offsets with a diff trick."""
    valid = np.ones(n, bool)
    ends = offsets[1:]          # end of each read (exclusive)
    # positions end-k+1 .. end-1 start a kmer that crosses/overruns the read
    lo = np.maximum(ends - (k - 1), offsets[:-1])
    d = np.zeros(n + 1, np.int32)
    np.add.at(d, lo, 1)
    np.add.at(d, np.minimum(ends, n), -1)
    bad = np.cumsum(d[:-1]) > 0
    valid &= ~bad
    return valid


class ModimizerScanner:
    """Streams a SeqBatch's code stream through the device scan.

    Produces (kmers, global_positions, isF) numpy arrays in exact stream
    order — the same order the reference's per-read iterator emits.
    """

    def __init__(self, sh: Seqhash, chunk: int = DEFAULT_CHUNK,
                 safety: float = 8.0):
        self.sh = sh
        self.chunk = chunk
        # expected matches per chunk = chunk/w; cap with generous headroom
        self.cap = int(min(chunk, max(1024, safety * chunk / sh.w)))

    def scan_stream(self, codes: np.ndarray, offsets: np.ndarray):
        """codes: uint8/int8 [N] (values 0..3), offsets: int64 [n+1]."""
        sh = self.sh
        k, w = sh.k, sh.w
        n = len(codes)
        codes = np.ascontiguousarray(codes).view(np.uint8)
        valid = _validity(np.asarray(offsets, np.int64), n, k)
        out_k, out_p, out_f = [], [], []
        C = self.chunk
        pad = k - 1
        for s in range(0, max(n, 1), C):
            m = min(C, n - s)
            if m <= 0:
                break
            cbuf = np.zeros(C + pad, np.uint8)
            avail = min(C + pad, n - s)
            cbuf[:avail] = codes[s:s + avail]
            vbuf = np.zeros(C, bool)
            vbuf[:m] = valid[s:s + m]
            kk, pp, ff, cnt = _scan_chunk(
                jnp.asarray(cbuf), jnp.asarray(vbuf), s, k, w,
                sh.factor1, self.cap)
            cnt = int(cnt)
            if cnt > self.cap:
                # overflow: redo this chunk with a bigger cap
                kk, pp, ff, cnt = _scan_chunk(
                    jnp.asarray(cbuf), jnp.asarray(vbuf), s, k, w,
                    sh.factor1, int(cnt) + 1024)
                cnt = int(cnt)
            out_k.append(np.asarray(kk[:cnt]))
            out_p.append(np.asarray(pp[:cnt]))
            out_f.append(np.asarray(ff[:cnt]))
        if not out_k:
            return (np.zeros(0, np.uint64), np.zeros(0, np.int64),
                    np.zeros(0, bool))
        return (np.concatenate(out_k), np.concatenate(out_p),
                np.concatenate(out_f))

    def scan_batch(self, batch):
        """Scan a SeqBatch; returns (kmers, read_ids, read_pos, isF)."""
        kmers, gpos, isF = self.scan_stream(batch.codes, batch.offsets)
        offsets = np.asarray(batch.offsets, np.int64)
        rid = np.searchsorted(offsets, gpos, side="right") - 1
        rpos = gpos - offsets[rid]
        return kmers, rid.astype(np.int64), rpos.astype(np.int64), isF


def first_encounter_unique(kmers: np.ndarray):
    """(unique kmers in first-encounter stream order, counts) — the exact
    insertion stream the reference's sequential table build would produce."""
    if len(kmers) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    uniq, first_idx, counts = np.unique(kmers, return_index=True,
                                        return_counts=True)
    order = np.argsort(first_idx, kind="stable")
    return uniq[order], counts[order].astype(np.uint32)
