"""Shared jax-version compatibility shims for the Pallas op wrappers."""
from __future__ import annotations

try:  # jax >= 0.8: top-level shard_map, checker kwarg is check_vma
    from jax import shard_map as _smap

    def shard_map_no_check(f, **kw):
        return _smap(f, check_vma=False, **kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _smap

    def shard_map_no_check(f, **kw):
        return _smap(f, check_rep=False, **kw)
