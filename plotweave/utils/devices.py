"""Device placement policy for the raster-stage programs."""

from __future__ import annotations

from contextlib import nullcontext


def raster_device_ctx(cfg):
    """Context manager placing the stage 01-04 device programs.

    ``cfg.raster_device``:

    - ``"auto"`` (default): the default backend — the TPU when attached.
    - ``"cpu"``: pin the raster programs to the LOCAL CPU backend.  The
      programs are integer/boolean only and bit-exact across backends (the
      e2e goldens are verified on both), but XLA:CPU compiles locally in
      about a second while the remote TPU compiler takes 30 s - 5 min per
      new image shape — so this is the cold-start / tunnel-down escape
      hatch for one-shot CLI runs.  Throughput work should stay on "auto".
    """
    mode = str(getattr(cfg, "raster_device", "auto") or "auto").lower()
    if mode == "cpu":
        import jax  # noqa: PLC0415

        if jax.default_backend() == "cpu":
            return nullcontext()
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:  # pragma: no cover — no CPU backend registered
            return nullcontext()
        return jax.default_device(cpu)
    return nullcontext()
