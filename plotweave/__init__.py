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
