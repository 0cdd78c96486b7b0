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
