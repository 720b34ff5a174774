"""Parameter partitioning rules (FSDP-style) over the named mesh.

Rule: for each param leaf pick the largest shardable dim (divisible by the
fsdp axis size), skipping the leading stacked-layer axis of scan'd params
(sharding the scan axis would force cross-device slicing every scan step).
Optimizer state inherits param sharding automatically (optax state mirrors
the param tree), giving ZeRO-2/3 behavior (reference DeepSpeed parity,
SURVEY.md §2.7#28) without any bespoke machinery.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_FSDP

# param-tree prefixes whose leaves carry a leading stacked-layer axis
STACKED_PREFIXES = ("blocks", "perceiver", "router_layers", "audio_layers")


def _spec_for_leaf(path: Tuple, leaf, fsdp_size: int, min_size: int = 2 ** 16) -> P:
    shape = leaf.shape
    if leaf.size < min_size or fsdp_size <= 1:
        return P()
    stacked = len(path) > 0 and getattr(path[0], "key", None) in STACKED_PREFIXES
    start = 1 if stacked else 0
    # prefer the largest dim (ties -> later dim for lane friendliness)
    dims = sorted(range(start, len(shape)),
                  key=lambda d: (shape[d], d), reverse=True)
    for d in dims:
        if shape[d] % fsdp_size == 0 and shape[d] >= fsdp_size:
            spec = [None] * len(shape)
            spec[d] = AXIS_FSDP
            return P(*spec)
    return P()


def param_specs(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    fsdp = mesh.shape[AXIS_FSDP]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_leaf(path, leaf, fsdp), params)


def param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        param_specs(params, mesh),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a (host or replicated) param tree onto the mesh per the rules."""
    sh = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)


def shard_bytes(params: Dict[str, Any], mesh: Mesh) -> Dict[str, int]:
    """Diagnostics: per-device vs replicated bytes under the current rules."""
    fsdp = mesh.shape[AXIS_FSDP]
    total = sharded = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        n = leaf.size * leaf.dtype.itemsize
        total += n
        spec = _spec_for_leaf(path, leaf, fsdp)
        if any(s is not None for s in spec):
            sharded += n
    per_device = sharded // fsdp + (total - sharded)
    return {"total": total, "sharded": sharded, "per_device": per_device}
