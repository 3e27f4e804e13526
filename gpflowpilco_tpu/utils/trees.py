"""Pytree partition/combine for per-leaf trainability.

Replaces GPflow's `set_trainable` machinery (used by reference pilco.py:67-74,
swingup freezes): a mask pytree of per-leaf booleans splits a model into a
trainable subtree (optimized) and a frozen remainder (closed over), so optimizers
— including L-BFGS, whose curvature estimates masking would corrupt — only ever
see genuinely free parameters.
"""
from __future__ import annotations

from typing import Callable

import jax


def tree_map_with_path_names(fn: Callable, tree):
    """Map fn(name, leaf) over a pytree, where name is a '/'-joined key path."""

    def convert(path):
        parts = []
        for p in path:
            if hasattr(p, "name"):
                parts.append(str(p.name))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            elif hasattr(p, "key"):
                parts.append(str(p.key))
            else:
                parts.append(str(p))
        return "/".join(parts)

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: fn(convert(path), leaf), tree
    )


def mask_from_names(tree, predicate: Callable[[str], bool]):
    """Build a per-leaf bool mask by testing each leaf's key-path name."""
    return tree_map_with_path_names(lambda name, _: bool(predicate(name)), tree)


def partition(tree, mask):
    """Split tree into (selected, rest): selected keeps leaves where mask is True,
    others become None (and vice versa)."""
    selected = jax.tree.map(lambda m, x: x if m else None, mask, tree)
    rest = jax.tree.map(lambda m, x: None if m else x, mask, tree)
    return selected, rest


def combine(selected, rest):
    """Inverse of partition: prefer selected leaves, fall back to rest."""
    return jax.tree.map(
        lambda a, b: b if a is None else a,
        selected,
        rest,
        is_leaf=lambda x: x is None,
    )
