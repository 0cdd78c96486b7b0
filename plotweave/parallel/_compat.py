"""shard_map import shim: ``jax.experimental.shard_map`` is deprecated in
jax ≥ 0.8 in favor of ``jax.shard_map`` (whose ``check_rep`` flag became
``check_vma``).  All plotweave call sites import from here."""

from __future__ import annotations

import jax

if hasattr(jax, "shard_map"):

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep: bool = True):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=check_rep
        )

else:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map  # type: ignore[no-redef]  # noqa: F401
