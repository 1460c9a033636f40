# coding: utf-8
"""Small helper for declaring frozen dataclasses as JAX pytrees.

Fields annotated normally are pytree leaves (arrays); fields listed in
``meta`` are static auxiliary data (hashable, trigger recompilation when
changed). This is the backbone of the functional design: potentials,
propagator parameter packs and scan states are all immutable pytrees that can
be passed straight into jitted/scanned/vmapped functions.
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

T = TypeVar("T")


def pytree_dataclass(cls=None, *, meta: tuple = ()):
    """Decorator: freeze a dataclass and register it as a JAX pytree.

    Parameters
    ----------
    meta : tuple of str
        names of fields that are static metadata rather than array leaves
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj: T, **changes) -> T:
    """dataclasses.replace for pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
