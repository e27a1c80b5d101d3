"""modimizer_tpu — a TPU-native modimizer framework (JAX/XLA/Pallas/pjit).

A from-scratch re-design of the capabilities of richarddurbin/modimizer
(reference mounted read-only at /root/reference) for TPU hardware:

- the rolling canonical k-mer hash + ``hash % d == 0`` modimizer filter runs as a
  vectorized XLA/Pallas scan over base-code batches (ops/seqhash.py),
- the modset k-mer dictionary is built with device-side compaction plus an exact
  host-side open-addressed-table replay (core/modset.py + native/), preserving the
  reference's first-encounter-order ids and on-disk ``MSHSTv2`` byte layout
  (reference: modset.c:45-104),
- multi-chip scaling shards the k-mer stream across a jax.sharding.Mesh with
  all_to_all routing by hash prefix and saturating-add merges (parallel/).

The CLI programs (cli/) mirror the reference's ordered-command surface
(modutils, modmap, modasm, composition, seqconvert, seqhoco, modrep, modtype).
"""

import os

# This container's (virtualized) host CPU executes some AVX512 code paths
# pathologically slowly; disable them for numpy when we're imported before
# numpy is.  Harmless elsewhere.
os.environ.setdefault(
    "NPY_DISABLE_CPU_FEATURES",
    "AVX512F AVX512CD AVX512_SKX AVX512_CLX AVX512_CNL AVX512_ICL")

_jax_configured = False


def configure_jax():
    """Configure jax for this framework; called by every module that uses
    the device path.  Importing jax costs ~2 s on this host, so host-only
    CLI paths never trigger it.

    - x64: the seqhash math is 64-bit (kmer * factor1 mod 2^64; reference
      seqhash.h:58); TPU emulates u64 on the VPU.  Must run before tracing.
    - persistent compilation cache: CLI invocations are separate processes,
      so only the first run pays the (tunnel-amplified) XLA compile cost.
    """
    global _jax_configured
    if _jax_configured:
        return
    import jax
    jax.config.update("jax_enable_x64", True)
    # The axon PJRT plugin force-selects itself at registration time, which
    # tramples an explicit JAX_PLATFORMS=cpu (used by the multi-chip dry run
    # and the CPU-mesh tests).  Re-assert the user's choice.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # per-platform cache dirs: entries AOT-compiled through the remote TPU
    # tunnel carry that machine's CPU features and poison local CPU runs
    # (cpu_aot_loader "machine feature" errors + silent recompiles)
    plat = os.environ.get("JAX_PLATFORMS", "") or "default"
    cache_dir = os.environ.get(
        "MODIMIZER_XLA_CACHE",
        os.path.expanduser("~/.cache/modimizer_tpu_xla-"
                           + plat.replace(",", "_")))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
    _jax_configured = True


def _prime_bytecode():
    """One-time self-prime of __pycache__: this image sets
    PYTHONDONTWRITEBYTECODE=1, so without this every CLI invocation
    re-compiles the package sources (~0.2 s of the ~0.33 s start).
    py_compile writes atomically; existing caches are respected, so this
    is a no-op after the first run."""
    pkg = os.path.dirname(os.path.abspath(__file__))
    if os.path.isdir(os.path.join(pkg, "cli", "__pycache__")):
        return

    def work():
        try:
            import compileall
            compileall.compile_dir(pkg, quiet=2, workers=1)
        except Exception:
            pass
    import threading
    # non-daemon: joined at interpreter exit, so even a usage-error run
    # finishes priming (~0.5 s, once per checkout)
    threading.Thread(target=work, daemon=False).start()


_prime_bytecode()

__version__ = "0.1.0"
