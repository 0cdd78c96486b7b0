"""Oracle smoke: three live-oracle byte-equality runs promoted into the
DEFAULT tier (round-3 verdict #9) so changes to stream/, vector/, stages/
or ops/ can't land a gross byte regression between full `-m oracle`
lattice runs.  One kmeans-photo seed, one swatch-mode seed, one 8-layer
run — ~2 min total on the 1-core host (each drives the reference pipeline
as a subprocess once or twice).

The heavyweight lattice (~26 reference subprocess runs) stays opt-in in
test_e2e_fuzz_live.py; this module reuses its fixtures/oracles with
distinct seeds, so the smoke adds coverage rather than repeating it.
"""

from __future__ import annotations

from pathlib import Path

import pytest

REF = Path("/root/reference/image_processor/pipeline.py")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")


def test_smoke_photo_stream_and_artifacts_byte_identical(tmp_path):
    """kmeans-photo seed: every stage artifact + the stream, byte-equal to
    the live reference (exercises the cv2-exact k-means chain)."""
    import test_e2e_fuzz_live as L

    L.test_e2e_fuzz_photo_byte_identical(tmp_path, seed=9001)


def test_smoke_swatch_mode_byte_identical(tmp_path):
    """Swatch-mode seed: masks + full-chain stream vs the reference's real
    (config-unreachable) swatch branch."""
    import test_e2e_fuzz_live as L

    L.test_swatch_mode_mask_oracle(tmp_path, seed=9091)


def test_smoke_8layer_stream_byte_identical(tmp_path):
    """8-layer run: rank ties, step-12 fallback, heavy cross-layer dedup."""
    import test_e2e_fuzz_live as L

    L.test_e2e_fuzz_8layers_stream_byte_identical(tmp_path)
