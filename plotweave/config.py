"""Pipeline configuration.

One dataclass registers EVERY knob the pipeline understands — both the
reference's base schema (reference: image_processor/config.py:9-91) and the
~40 "extended" keys the reference steps probe via ``getattr(cfg, key,
default)`` (e.g. 08_dedup_layer_basic.py:484-505, 10_dedup_cross_basic.py:
217-229, 13_build_stream.py:62-74).  The reference's loader silently drops
unknown JSON keys (config.py:124-126), so an extended key only ever takes
effect if registered; we register them all, which reproduces the effective
behavior while making the schema explicit.

Keys whose reference default is *derived* (e.g. ``tap_diameter_px`` defaults
to ``pen_width_px``) are stored as ``None`` and resolved by the ``resolve_*``
helpers at the use site, exactly like the reference's inline ``getattr``
defaults.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, fields, asdict
from typing import Dict, List, Optional, Tuple

BGR = Tuple[int, int, int]


@dataclass
class PipelineConfig:
    # ---- I/O ----
    input_image: str = "input.png"
    output_dir: str = "output"
    n_cores: int = 12

    # ---- resize (step 01) ----
    max_dimension: int = 2000

    # ---- color layers (step 02) ----
    color_names: List[str] = field(
        default_factory=lambda: ["layer_dark", "layer_mid", "layer_skin", "layer_light"]
    )
    colors: List[BGR] = field(
        default_factory=lambda: [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    )
    color_tolerance: int = 30
    extraction_mode: str = "kmeans"          # "kmeans" | "swatch"
    cluster_k: Optional[int] = None          # default: len(color_names)
    kmeans_sample_limit: int = 200_000
    kmeans_attempts: int = 3
    kmeans_iters: int = 40
    kmeans_seed: int = 42
    extract_open_iters: int = 1
    extract_close_iters: int = 1

    # ---- edge detection (step 03) ----
    edge_low_threshold: int = 50
    edge_high_threshold: int = 150
    edge_kernel_size: int = 3
    edge_morph_kernel: int = 3
    edge_morph_open_iters: int = 1
    edge_morph_close_iters: int = 1
    smoothing_iterations: int = 2

    # ---- contours / vectorization (step 04) ----
    min_contour_area: float = 10.0
    epsilon_factor: float = 0.002
    dedup_max_passes: int = 10
    thinning_min_segment_len: int = 5
    thinning_dt_margin: float = 0.0

    # ---- page geometry (steps 05+) ----
    target_width_mm: int = 210
    target_height_mm: int = 297
    pixels_per_mm: int = 40
    target_width_px: int = 0                 # 0 = derive from mm * ppm
    target_height_px: int = 0
    keep_aspect: bool = True
    margin_left_mm: float = 10.0
    margin_right_mm: float = 10.0
    margin_top_mm: float = 10.0
    margin_bottom_mm: float = 10.0

    # ---- pen geometry ----
    pen_width_px: int = 60
    pen_radius_px: int = 30

    # ---- tap detection ----
    tap_max_area: float = 1200.0
    tap_max_perimeter: float = 160.0
    tap_max_dim: int = 25
    tap_merge_radius_px: int = 30
    tap_diameter_px: Optional[float] = None        # default: pen_width_px
    min_keep_diameter_px: Optional[float] = None   # default: max(10, pen_radius*0.4)
    tap_max_vertices: int = 50
    tap_max_perimeter_px: Optional[float] = None   # step 10's name; default 2.5*tap_diameter

    # ---- intra-layer dedup (step 08) ----
    dedup_sample_step: int = 8
    dedup_overlap_threshold: float = 0.60
    dedup_draw_antialiased: bool = False
    ignore_tail_points_intra: int = 120
    ignore_tail_len_px: Optional[float] = None     # default: ignore_tail_points_intra
    collision_radius_intra_px: float = 18.0
    collision_radius_global_px: float = 21.0
    hash_stride_px: float = 18.0
    max_join_jump_px: float = 80.0
    intra_post_skeleton_enabled: bool = True
    intra_post_brush_px: int = 16
    intra_post_resample_step_px: float = 6.0
    intra_post_rdp_epsilon_px: Optional[float] = None   # default: max(1.0, 0.08*brush)
    intra_post_min_path_len_px: Optional[int] = None    # default: max(2*brush, 12)

    # ---- cross-layer dedup (step 10) ----
    cross_lines_brush_diam_px: Optional[float] = None   # default: pen_width_px*2
    cross_taps_brush_diam_px: Optional[float] = None    # default: pen_width_px*2
    cross_cut_step_px: float = 1.0
    cross_debug_masks: bool = False

    # ---- plot-order optimization (step 12) ----
    plotopt_tap_insert_radius_px: Optional[float] = None  # default: max(80, pen_width_px)
    plotopt_two_opt: bool = False  # refine the greedy tour (plotweave extension;
    # changes op order only — off by default to preserve reference byte-equality)
    # With refinement on, op lists of at least this many entries route
    # through the on-device refiner (vector/refine_device.py: every 2-opt +
    # relocation move evaluated at once as n×n matrices) instead of the
    # O(n²)-Python host scan.  0 disables; engages only when the default
    # backend is a real accelerator.  Result is length-verified on host and
    # never worse than the greedy tour.
    refine_device_min_n: int = 600

    # ---- stream build (step 13) ----
    steps_per_mm: int = 40  # plotter step density (stage-14 canvas sizing)
    draw_div_start: int = 25
    draw_div_fast: int = 15
    draw_profile: str = "triangle"
    corner_deg: float = 85.0
    corner_div: int = 30
    corner_window_steps: int = 800
    travel_div_fast: int = 10
    stream_force_color_index: Optional[int] = None
    stream_color_by_name: Optional[Dict[str, int]] = None
    stream_color_by_order: Optional[List[int]] = None

    # ---- previews (steps 06/09/11) ----
    scaled_preview_thickness_px: int = 1
    scaled_preview_antialiased: bool = True
    preview_line_thickness_px: int = 1
    preview_antialiased: bool = True

    # ---- misc ----
    simplify_enabled: bool = False
    stop_after_edges: bool = False

    # ---- plotweave extensions (not in the reference schema) ----
    # "host-exact" — numpy-RNG k-means++ seeding (reference-deterministic:
    #   the sampled pixel set and init draws replicate 02:41); requires one
    #   sample transfer per image.
    # "device"     — jax-PRNG subsample + seeding, fully fused into a single
    #   dispatch (no sample transfer, fastest); deterministic for a given
    #   seed but NOT reference-RNG-compatible — masks are equivalent, not
    #   byte-pinned to the host-exact path on non-separable inputs.
    kmeans_init: str = "host-exact"
    # Row-shard the stage 02-04 fused raster program over a device mesh
    # (parallel/spatial.py halo exchange; bit-identical to single-device).
    # shard_rows: 0 = off; N>0 = shard over up to N devices (fitted down to
    # the largest row-divisor ≤ min(N, device count); 1 runs the sharded
    # program on a degenerate 1-device mesh).
    shard_rows: int = 0
    # shard_auto_mpx: 0 = off; >0 = auto-engage sharding over all devices
    # when resized H×W exceeds this many megapixels (the TPU answer to the
    # reference's resolution cap at 01_resize.py:15-20).
    shard_auto_mpx: float = 0.0
    # Device placement for the stage 01-04 raster programs:
    # "auto" = default backend (TPU when attached); "cpu" = local CPU
    # backend — bit-exact, compiles locally in ~1 s vs minutes on the
    # remote TPU compiler: the cold-start / tunnel-down escape hatch.
    raster_device: str = "auto"
    # Stage 07 plans with at least this many contours route through the
    # on-device greedy planner (vector/planner_device.py) instead of the
    # host C++ loop — identical ordering (measured exact on the chip),
    # faster above the measured production-path crossover at n≈4500 (see
    # CONFIG.md + BASELINE.md).  0 disables.  Engages only when the
    # default backend is a real accelerator; cold-cache first use of a
    # size bucket pays a long remote compile (pre-warm:
    # tests/tools/warm_planner_cache.py).
    planner_device_min_n: int = 4500

    # ------------------------------------------------------------------
    def ensure_output_dirs(self) -> None:
        os.makedirs(self.output_dir, exist_ok=True)
        for name in self.color_names:
            os.makedirs(os.path.join(self.output_dir, name), exist_ok=True)

    # ---- derived-default resolvers (reference getattr-site defaults) ----
    def resolve_cluster_k(self) -> int:
        k = self.cluster_k if self.cluster_k else len(self.color_names)
        return max(2, min(len(self.color_names), int(k)))

    def resolve_tap_diameter(self) -> float:
        return float(self.tap_diameter_px) if self.tap_diameter_px else float(self.pen_width_px)

    def resolve_min_keep_diameter(self) -> float:
        if self.min_keep_diameter_px:
            return float(self.min_keep_diameter_px)
        return max(10.0, float(self.pen_radius_px) * 0.4)

    def resolve_min_keep_diameter_cross(self) -> float:
        """Step 10 derives from pen *width*/2, not pen_radius (10:219)."""
        if self.min_keep_diameter_px:
            return float(self.min_keep_diameter_px)
        return max(10.0, (float(self.pen_width_px) / 2.0) * 0.4)

    def resolve_tap_max_perimeter_intra(self) -> float:
        # step 08 probes "tap_max_perimeter", a base-schema field (08:491)
        return float(self.tap_max_perimeter)

    def resolve_tap_max_perimeter_cross(self) -> float:
        # step 10 probes "tap_max_perimeter_px" with default 2.5×tap diameter (10:220)
        if self.tap_max_perimeter_px:
            return float(self.tap_max_perimeter_px)
        return 2.5 * self.resolve_tap_diameter()

    def resolve_ignore_tail_len(self) -> float:
        if self.ignore_tail_len_px:
            return float(self.ignore_tail_len_px)
        return float(self.ignore_tail_points_intra)

    def resolve_intra_rdp_eps(self) -> float:
        if self.intra_post_rdp_epsilon_px:
            return float(self.intra_post_rdp_epsilon_px)
        return max(1.0, 0.08 * self.intra_post_brush_px)

    def resolve_intra_min_path_len(self) -> int:
        if self.intra_post_min_path_len_px:
            return int(self.intra_post_min_path_len_px)
        return max(2 * self.intra_post_brush_px, 12)

    def resolve_cross_brushes(self) -> Tuple[float, float]:
        d = float(self.pen_width_px) * 2.0
        lines = float(self.cross_lines_brush_diam_px) if self.cross_lines_brush_diam_px else d
        taps = float(self.cross_taps_brush_diam_px) if self.cross_taps_brush_diam_px else d
        return lines, taps

    def resolve_tap_insert_radius(self) -> float:
        if self.plotopt_tap_insert_radius_px:
            return float(self.plotopt_tap_insert_radius_px)
        return max(80.0, float(self.pen_width_px))

    def target_size_px(self) -> Tuple[int, int]:
        """Target canvas (W, H) in px; 0 if it must fall back to resized.png.

        Priority matches 05_scale_vectors.py:15-40: explicit px → mm×ppm → 0.
        """
        if self.target_width_px > 0 and self.target_height_px > 0:
            return int(self.target_width_px), int(self.target_height_px)
        if self.target_width_mm > 0 and self.target_height_mm > 0 and self.pixels_per_mm > 0:
            return (
                int(round(float(self.target_width_mm) * self.pixels_per_mm)),
                int(round(float(self.target_height_mm) * self.pixels_per_mm)),
            )
        return 0, 0

    def margins_px(self) -> Tuple[int, int, int, int]:
        ppm = int(self.pixels_per_mm or 40)
        vals = [
            int(round(float(m) * ppm))
            for m in (self.margin_left_mm, self.margin_right_mm, self.margin_top_mm, self.margin_bottom_mm)
        ]
        return tuple(max(0, v) for v in vals)  # type: ignore[return-value]

    def to_json(self) -> dict:
        return asdict(self)


_FIELDS = {f.name for f in fields(PipelineConfig)}


def load_config(path: Optional[str] = None) -> PipelineConfig:
    """Load config from ``path`` or the CONFIG_PATH env var.

    Unknown JSON keys are dropped (matching the reference's effective
    semantics, config.py:124-126); the raw dict is kept on ``cfg._raw``.
    """
    p = path or os.environ.get("CONFIG_PATH")
    if not p:
        return PipelineConfig()
    try:
        with open(p, "r", encoding="utf-8") as f:
            data = json.load(f)
    except Exception as e:  # noqa: BLE001 — reference falls back to defaults
        print(f"[config] WARNING: failed to read JSON ({e}); using defaults.")
        return PipelineConfig()

    known = {k: v for k, v in data.items() if k in _FIELDS}
    # JSON turns tuples into lists; normalize color swatches.
    if "colors" in known:
        known["colors"] = [tuple(int(v) for v in c) for c in known["colors"]]
    cfg = PipelineConfig(**known)
    cfg._raw = data  # type: ignore[attr-defined]
    cfg._path = p  # type: ignore[attr-defined]
    return cfg


def save_config(cfg: PipelineConfig, path: str, overrides: Optional[dict] = None) -> str:
    """Persist config JSON, merging an existing file with overrides (CLI wins).

    Mirrors the reference pipeline's write_config (pipeline.py:21-45).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if os.path.exists(path):
        try:
            with open(path, "r", encoding="utf-8") as f:
                merged = json.load(f)
        except Exception:  # noqa: BLE001
            merged = {}
    else:
        merged = cfg.to_json()
    for k, v in (overrides or {}).items():
        if v is not None:
            merged[k] = v
    with open(path, "w", encoding="utf-8") as f:
        json.dump(merged, f, indent=2, ensure_ascii=False)
    return path
