"""Device placement policy for the raster-stage programs."""

from __future__ import annotations

from contextlib import nullcontext


def raster_device_ctx(cfg):
    """Context manager placing the stage 01-04 raster device programs.

    ``cfg.raster_device``:

    - ``"auto"`` (default): the default backend — the TPU when attached.
    - ``"cpu"``: pin the raster programs to the LOCAL CPU backend.  The
      host-exact raster chain is integer/boolean only and bit-exact across
      backends (the e2e goldens are verified on both), but XLA:CPU compiles
      locally in about a second while the remote TPU compiler takes
      30 s - 5 min per new image shape — the cold-start / tunnel-down
      escape hatch.  Throughput work should stay on "auto".

    Note: stage 02 deliberately does NOT apply this context to the
    ``kmeans_init="device"`` float k-means program — float reduction order
    differs across backends, so pinning it to CPU would silently change
    masks; the bit-exact claim is scoped to the integer chain.
    """
    mode = str(getattr(cfg, "raster_device", "auto") or "auto").lower()
    if mode == "auto":
        return nullcontext()
    if mode != "cpu":
        raise ValueError(
            f"raster_device must be 'auto' or 'cpu', got {mode!r}"
        )
    import jax  # noqa: PLC0415

    # The tunnel can HANG outright (CLAUDE.md) — and merely *initializing*
    # the axon backend blocks on it.  When no backend is live yet, make the
    # escape hatch total: force the platform to CPU so the hung plugin is
    # never touched.  (Once backends are initialized — e.g. mid batch run —
    # fall through to per-dispatch pinning on the already-live backends.)
    try:
        from jax._src import xla_bridge as _xb  # noqa: PLC0415

        backends_live = bool(_xb.backends_are_initialized())
    except AttributeError:  # private API may move across JAX versions
        backends_live = True
    if not backends_live:
        jax.config.update("jax_platforms", "cpu")
        return nullcontext()

    if jax.default_backend() == "cpu":
        return nullcontext()
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        print(
            "[raster-device] warning: no local CPU backend registered — "
            "falling back to the default backend (remote compiles apply)"
        )
        return nullcontext()
    return jax.default_device(cpu)
