"""Driver entry-point contract: dryrun_multichip must be hermetic.

Round-1 failure mode (MULTICHIP_r01.json): the driver environment exposed a
*poisoned* default TPU backend (libtpu AOT/terminal version skew) and the
dryrun let an eager `convert_element_type` reach it → FAILED_PRECONDITION.
The fix re-initializes JAX as a CPU-only platform with the requested device
count before any array is created, even when backends are already live.

These tests run the entry in a clean subprocess (no conftest env) so the
backend-initialization ordering is the same as in the driver.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, extra_env=None) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"  # never touch the tunnel from tests
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1800,
    )


@pytest.mark.slow
def test_dryrun_after_backends_initialized():
    """The round-1 crash: backends initialized (1 device, eager op ran)
    before dryrun_multichip — it must re-init to 8 CPU devices and pass."""
    r = _run(
        """
import jax, jax.numpy as jnp
# the axon plugin overrides JAX_PLATFORMS env (see conftest) — force CPU
# programmatically so the prelude init never depends on a live tunnel
jax.config.update("jax_platforms", "cpu")
x = jnp.asarray([1.0, 2.0]) * 2  # initialize backends: 1 CPU device
assert len(jax.devices()) == 1, jax.devices()
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
devs = jax.devices()
assert len(devs) == 8 and all(d.platform == "cpu" for d in devs), devs
print("HERMETIC_OK")
"""
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "HERMETIC_OK" in r.stdout


@pytest.mark.slow
def test_dryrun_fresh_process():
    """Driver-style fresh process: no prior backend, forced flag absent."""
    r = _run(
        """
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
print("FRESH_OK")
"""
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "FRESH_OK" in r.stdout
