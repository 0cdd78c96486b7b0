"""plotweave — TPU-native image→plotter-stream framework.

A ground-up JAX/XLA/Pallas re-design of the OmniRevolve image processor
(reference: omnirevolve/omnirevolve-image-processor): raster images (and
SVG / G-code inputs) become binary motion streams for an 8-pen XY plotter.

Layering (see SURVEY.md for the reference layer map this mirrors):

- ``plotweave.stream``   — byte protocol: encoder (motion planning + byte
  serialization), decoder/simulator (the executable spec / test oracle).
- ``plotweave.ops``      — batched, jittable image ops (resize, Lab k-means,
  morphology, Gaussian, Canny, Zhang–Suen thinning) for TPU via JAX/Pallas.
- ``plotweave.vector``   — geometry stages: centerline tracing, scaling,
  travel-order sorting, intra-/cross-layer dedup, plot-order planning.
- ``plotweave.stages``   — the 14 numbered pipeline stages with the
  reference-compatible on-disk artifact contract.
- ``plotweave.frontends``— SVG / G-code input paths.
- ``plotweave.parallel`` — device-mesh sharding utilities (batch of images
  over TPU chips via jax.sharding + shard_map).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the axon TPU compiler takes minutes on the
# fused stencil programs; caching cuts cold pipeline runs to warm-run speed.
import os as _os  # noqa: E402


def _enable_compilation_cache() -> None:
    if _os.environ.get("PLOTWEAVE_NO_JAX_CACHE"):
        return
    path = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.expanduser(
        "~/.cache/plotweave/jax"
    )
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    try:
        _os.makedirs(path, exist_ok=True)
        import sys as _sys

        if "jax" in _sys.modules:  # jax already imported: set via config
            import jax as _jax

            _jax.config.update("jax_compilation_cache_dir", path)
    except (OSError, Exception):  # noqa: BLE001 — cache is best-effort
        pass


_enable_compilation_cache()


def _retain_heap() -> None:
    """Keep freed large buffers in the process heap (glibc mallopt).

    By default glibc serves multi-MB numpy temporaries via mmap and munmaps
    them on free, so every stage's big temporary re-pays fresh page faults.
    On this class of host that cost is pathological and EPISODIC: measured
    55 ms/MB during bad phases (a 240 MB first-touch took 13 s) vs ~0.3 ms/MB
    warm — reusing warm heap pages is 100×+ cheaper than re-faulting.  Raising
    the mmap/trim thresholds makes the heap grow to the pipeline's peak
    working set once and stay there (hundreds of MB against 128 GB RAM).
    Opt out with PLOTWEAVE_NO_MALLOC_TUNE=1.
    """
    if _os.environ.get("PLOTWEAVE_NO_MALLOC_TUNE"):
        return
    try:
        import ctypes as _ctypes

        libc = _ctypes.CDLL(None)
        GB = 1 << 30
        libc.mallopt(-3, GB)  # M_MMAP_THRESHOLD: heap-serve allocations < 1 GB
        libc.mallopt(-1, GB)  # M_TRIM_THRESHOLD: never return freed heap < 1 GB
    except (OSError, AttributeError):  # pragma: no cover — non-glibc hosts
        pass


_retain_heap()
