"""Test environment: force JAX onto a virtual 8-device CPU mesh.

The axon TPU plugin in this image prepends itself to jax_platforms even when
JAX_PLATFORMS=cpu is exported, so we must force the config programmatically
before any backend initialization.  Running tests over the TPU tunnel is both
slow (~seconds of RTT per dispatch) and numerically different (f32 matmuls
default to bf16 passes on TPU).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
