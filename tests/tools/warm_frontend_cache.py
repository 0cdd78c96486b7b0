#!/usr/bin/env python3
"""Pre-warm the persistent compile cache for the fused 02→04 chain programs.

ANY source change to the jitted programs invalidates their persistent-cache
entries, and a fresh-process cfg3 run then pays a 78–85 s first run (round-4
BASELINE captures) while the remote compiler rebuilds the chain.  Run this
once after committing changes to ops/, stages/s02*, or parallel/spatial.py —
it dispatches the EXACT programs the benches/pipeline compile, at the golden
shapes, so the next fresh process starts warm (same pattern as
warm_planner_cache.py; CLAUDE.md "Commands").

Profiles (comma list via --profiles; default e2e,cfg3):
  e2e      bench.py's end-to-end image (1024×768, k=4, ek=7) solo chain
  cfg3     bench_cfg3's 4K poster (resized 2000×1125, k=8, ek=5) solo chain
  frontend bench.py --frontend's raster_frontend (2000×1500, k=4)
  batch    the mesh-DP batched chain at group buckets 1/2/4 (bench_batch)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def _packed(k: int, h: int, w: int, seed: int = 0) -> np.ndarray:
    """One-hot labels bit-packed the way stage 02 uploads them."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, k, (h, w))
    return np.ascontiguousarray(
        np.stack([np.packbits(labels == i, axis=-1) for i in range(k)])
    )


def _chain_params(cfg) -> tuple:
    from plotweave.stages.common import edge_params

    return edge_params(cfg)  # the mask refine is host-side cv2 since round 5


def _cfg(overrides: dict):
    from plotweave.config import PipelineConfig

    cfg = PipelineConfig()
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def warm_solo(tag: str, k: int, h: int, w: int, cfg) -> None:
    import jax.numpy as jnp

    from plotweave.stages.s02_color_extract import _chain_from_clean

    t0 = time.perf_counter()
    blob = _chain_from_clean(jnp.asarray(_packed(k, h, w)), w, *_chain_params(cfg))
    # host-fetch sync (block_until_ready is unreliable on this backend)
    float(np.asarray(jnp.sum(blob.astype(jnp.int32))))
    print(f"[warm] {tag}: solo chain ({k},{h},{w}) in {time.perf_counter() - t0:.1f}s")


def warm_batch(cfg, buckets=(1, 2, 4)) -> None:
    import jax.numpy as jnp

    from plotweave.parallel.batchrun import _compiled_chain
    from plotweave.parallel.mesh import data_sharding, make_mesh

    import jax

    mesh = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    k, h, w = 4, 768, 1024
    p = _packed(k, h, w)
    for b in buckets:
        t0 = time.perf_counter()
        fn = _compiled_chain(mesh, w, _chain_params(cfg))
        dev = jax.device_put(np.stack([p] * b), data_sharding(mesh))
        out = fn(dev)
        float(np.asarray(jnp.sum(out.astype(jnp.int32))))
        print(f"[warm] batch: bucket {b} ({b},{k},{h},{w}) in {time.perf_counter() - t0:.1f}s")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profiles", default="e2e,cfg3",
                    help="comma list of e2e,cfg3,frontend,batch")
    args = ap.parse_args()
    profiles = [p.strip() for p in args.profiles.split(",") if p.strip()]

    import plotweave  # noqa: F401 — enables the persistent compile cache
    import jax

    print(f"backend: {jax.default_backend()}; warming {profiles}")

    # param sets must mirror the bench configs exactly — program cache keys
    # include every static argument
    e2e_cfg = _cfg({"edge_low_threshold": 22, "edge_high_threshold": 70,
                    "edge_kernel_size": 7})
    cfg3_cfg = _cfg({"edge_low_threshold": 22, "edge_high_threshold": 70,
                     "edge_kernel_size": 5})

    for p in profiles:
        if p == "e2e":
            warm_solo("e2e", 4, 768, 1024, e2e_cfg)
        elif p == "cfg3":
            # 3840×2160 poster resized to the 2000-px cap → 2000×1125, 8 layers
            warm_solo("cfg3", 8, 1125, 2000, cfg3_cfg)
        elif p == "frontend":
            from plotweave.ops.frontend import raster_frontend
            import jax.numpy as jnp

            img = np.zeros((1500, 2000, 3), np.uint8)
            ctrs = np.array([[40, 128, 128], [110, 140, 120],
                             [180, 150, 140], [240, 128, 126]], np.float32)
            t0 = time.perf_counter()
            out = raster_frontend(img, ctrs, k=4)
            float(sum(np.asarray(jnp.sum(jnp.asarray(o, jnp.float32)))
                      for o in jax.tree.leaves(out)))
            print(f"[warm] frontend: (1500,2000) in {time.perf_counter() - t0:.1f}s")
        elif p == "batch":
            warm_batch(e2e_cfg)
        else:
            print(f"[warm] unknown profile {p!r} — skipped")


if __name__ == "__main__":
    main()
