"""Multi-host sharded modset build (BASELINE config 4: merge + annotate a
read-set modset across a pod slice).

Each host feeds its own shard of the read stream (its own files) through the
same mesh-sharded pipeline as the single-host builder; the mesh spans every
process's devices (ICI within a host, DCN across hosts via jax.distributed).
Exactness is preserved the same way as single-host: every emitted k-mer
carries its global stream position (each host's shard has a global base
offset), so the finalized table is in first-encounter order of the
concatenated global stream regardless of which host scanned what.

Host-local data enters the global arrays with
``jax.make_array_from_single_device_arrays``; results leave through a
``process_allgather`` of the sharded state.
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .sharded import ShardedModsetBuilder


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_devices: int = None):
    """jax.distributed bring-up (DCN loopback-friendly for tests)."""
    import os
    if local_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


class MultiHostModsetBuilder(ShardedModsetBuilder):
    """ShardedModsetBuilder over a multi-process (multi-host) mesh.

    Differences from the single-process builder:
      - host->device inputs are assembled per-process from local shards and
        stitched into global arrays;
      - each process packs only the slices owned by its local devices;
      - finalize gathers the sharded state to every host.
    """

    def _fetch(self, x):
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    def _globalize(self, per_device_np, dtype):
        """per_device_np: list over LOCAL device ordinals of local rows
        [1, width]; returns a global [n_global, width] array sharded by
        'shard'."""
        mesh = self.mesh
        sharding = NamedSharding(mesh, P("shard"))
        local = jax.local_devices()
        arrs = [jax.device_put(np.asarray(x, dtype), d)
                for x, d in zip(per_device_np, local)]
        width = per_device_np[0].shape[-1]
        return jax.make_array_from_single_device_arrays(
            (self.n, width), sharding, arrs)

    def feed_stream(self, codes: np.ndarray, offsets: np.ndarray,
                    base: int = 0):
        """codes/offsets: THIS host's shard of the global stream; base: its
        global position offset.  Shards may be uneven: the step count is
        agreed globally (max over processes), and hosts that run out of
        data keep participating with empty (all-invalid) chunks so the
        collectives stay in lockstep."""
        from jax.experimental import multihost_utils
        from ..ops.packed import pack_bits, pack_sw
        from ..ops.seqhash import _validity
        sh = self.sh
        k = sh.k
        n_total = len(codes)
        codes = np.ascontiguousarray(codes).view(np.uint8)
        valid_all = _validity(np.asarray(offsets, np.int64), n_total, k)
        C = self.chunk
        NW = C // 32
        local = jax.local_devices()
        n_local = len(local)
        # device d_global owns slice [d_local * C, ...) of this host's shard
        local_super = n_local * C
        n_steps = max(1, -(-max(n_total, 1) // local_super))
        if jax.process_count() > 1:
            all_steps = np.asarray(multihost_utils.process_allgather(
                np.array([n_steps], np.int64), tiled=True)).reshape(-1)
            n_steps = int(all_steps.max())
        for step_i in range(n_steps):
            s = step_i * local_super
            sws, vbs, gps = [], [], []
            for dl in range(n_local):
                st = s + dl * C
                sw = np.zeros(NW + 2, np.uint64)
                vb = np.zeros(C // 64, np.uint64)
                if st < n_total:
                    seg = codes[st:st + C + k - 1]
                    sw = pack_sw(seg, NW + 2)
                    m = min(C, n_total - st)
                    vb = pack_bits(valid_all[st:st + m], C // 64)
                sws.append(sw[None])
                vbs.append(vb[None])
                gps.append(np.array([[base + st]], np.uint64))
            sw_g = self._globalize(sws, np.uint64)
            vb_g = self._globalize(vbs, np.uint64)
            gp_g = self._globalize(gps, np.uint64)
            out = self._route((sw_g, vb_g, gp_g))
            recv_width = self._recv_rows()
            if self._buffered_rows() + recv_width > self.max_buffer_rows:
                self._compact()
            self._append(out, np.uint64(base + s))
            self._pending.append(((sw_g, vb_g, gp_g), np.uint64(base + s),
                                  out))
            self._check_pending()
        self._check_pending(force=True)

    def finalize(self):
        from jax.experimental import multihost_utils
        self._compact()
        ks = multihost_utils.process_allgather(self.state_k, tiled=True)
        ds = multihost_utils.process_allgather(self.state_d, tiled=True)
        ms = multihost_utils.process_allgather(self.state_m, tiled=True)
        ks = np.asarray(ks).reshape(-1)
        ds = np.asarray(ds).reshape(-1)
        ms = np.asarray(ms).reshape(-1)
        real = ks != 0xFFFFFFFFFFFFFFFF
        ks, ds, ms = ks[real], ds[real], ms[real]
        order = np.argsort(ms, kind="stable")
        return ks[order], np.minimum(ds[order], 0xFFFF).astype(np.uint32)
