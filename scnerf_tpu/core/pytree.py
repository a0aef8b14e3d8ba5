"""Minimal pytree-dataclass machinery.

Everything learnable in scnerf-tpu is a frozen dataclass registered as a JAX
pytree: parameters are data leaves, configuration is static metadata. This
replaces the reference's ``nn.Module``/``register_parameter`` pattern
(``/root/reference/model/camera_model.py:120-163``) with pure functional
pytrees that compose with ``jit``/``grad``/``shard_map``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, TypeVar

import jax

_T = TypeVar("_T")


def pytree_dataclass(cls: type[_T] | None = None, *, meta_fields: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields named in ``meta_fields`` (or whose dataclass field metadata contains
    ``static=True``) become static metadata; everything else is a data leaf.
    """

    def wrap(c: type[_T]) -> type[_T]:
        c = dataclasses.dataclass(frozen=True)(c)
        metas = set(meta_fields)
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                metas.add(f.name)
        data = [f.name for f in dataclasses.fields(c) if f.name not in metas]
        meta = [f.name for f in dataclasses.fields(c) if f.name in metas]
        jax.tree_util.register_dataclass(c, data_fields=data, meta_fields=meta)

        def replace(self, **kw):
            return dataclasses.replace(self, **kw)

        c.replace = replace  # type: ignore[attr-defined]
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def static_field(**kwargs) -> Any:
    """A dataclass field treated as static pytree metadata."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def tree_select(pred, a, b):
    """Elementwise ``jnp.where(pred, a, b)`` over matching pytrees."""
    import jax.numpy as jnp

    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_scale(tree, s):
    return jax.tree.map(lambda x: x * s, tree)


def tree_map_with_path_names(fn: Callable[[str, Any], Any], tree):
    """Map ``fn(dotted_name, leaf)`` over a pytree (for masking by name)."""

    def _name(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "name"):
                parts.append(str(p.name))
            elif hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
        return ".".join(parts)

    return jax.tree_util.tree_map_with_path(lambda p, x: fn(_name(p), x), tree)
