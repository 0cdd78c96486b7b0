"""The 14 numbered pipeline stages.

Each stage is ``run(cfg) -> None`` over the on-disk artifact contract
(SURVEY §1 dataflow): stages read what earlier stages wrote under
``cfg.output_dir`` and write their own artifacts there, so any prefix can be
resumed (--start-step/--end-step) and the reference's previews validate the
outputs unchanged.
"""

from . import common  # noqa: F401
