"""Tensor-parallel inference sharding for the DiT (serving path).

The flagship model (~17 GB bf16 with conditioning modules) exceeds one
v5e's 16 GB HBM — serving shards it Megatron-style over the `tp` mesh axis
and lets GSPMD partition the einsums: attention QKV projections column-wise
(heads split across chips), output projections row-wise, FFN up/down
likewise.  Activations stay replicated at block boundaries (XLA inserts the
reduce-scatter/all-gathers).  This is a TPU-native superset — the reference
has no TP at all (SURVEY §2.7 #31).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_TENSOR

# path-suffix -> (sharded_dim_from_end) rules; leading stacked axes are
# handled by position-from-END so stacked and unstacked leaves share rules.
_COL = {  # shard output features (last dim)
    "attn1/to_q/kernel", "attn1/to_k/kernel", "attn1/to_v/kernel",
    "attn1/to_q/bias", "attn1/to_k/bias", "attn1/to_v/bias",
    "ff/net_0/kernel", "ff/net_0/bias",
    "to_q/kernel", "to_kv/kernel",           # perceiver/lfe
    "to_k/kernel", "to_v/kernel",
    "w1/kernel", "w2/kernel", "w1/bias", "w2/bias",  # eva swiglu (if reused)
}
_ROW = {  # shard input features (second-to-last dim of the kernel)
    "attn1/to_out/kernel", "ff/net_2/kernel",
    "to_out/kernel",
    "w3/kernel",
}


def _match(path_str: str, suffixes) -> bool:
    return any(path_str.endswith(s) for s in suffixes)


def tp_specs(params: Dict[str, Any], tp_size: int) -> Dict[str, Any]:
    def spec(path, leaf):
        if tp_size <= 1:
            return P()
        ps = "/".join(str(getattr(k, "key", k)) for k in path)
        nd = leaf.ndim
        if _match(ps, _COL) and leaf.shape[-1] % tp_size == 0:
            s = [None] * nd
            s[-1] = AXIS_TENSOR
            return P(*s)
        if _match(ps, _ROW) and nd >= 2 and leaf.shape[-2] % tp_size == 0:
            s = [None] * nd
            s[-2] = AXIS_TENSOR
            return P(*s)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    tp = mesh.shape[AXIS_TENSOR]
    specs = tp_specs(params, tp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: isinstance(x, P))
