"""Device mesh construction for data/FSDP/tensor parallel execution.

TPU-native replacement for the reference's Accelerate+DeepSpeed/NCCL stack
(SURVEY.md §2.7): one `jax.sharding.Mesh` created at program start; pjit
emits all collectives over ICI.  The reference's ZeRO-2 (grad+opt-state
sharding over 8 GPUs, `zero_stage2_config.json`) maps to the `fsdp` axis
here (a superset: params are sharded too and all-gathered per layer).
Multi-host (the 2x8 `hostfile.txt` config) = `jax.distributed.initialize`
+ the same mesh spanning slices over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "dp"
AXIS_FSDP = "fsdp"
AXIS_TENSOR = "tp"


def create_mesh(dp: Optional[int] = None, fsdp: int = 1, tp: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a (dp, fsdp, tp) mesh.  `dp=None` absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % (fsdp * tp) != 0:
            raise ValueError(f"{n} devices not divisible by fsdp*tp={fsdp * tp}")
        dp = n // (fsdp * tp)
    if dp * fsdp * tp != n:
        raise ValueError(f"mesh {dp}x{fsdp}x{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, (AXIS_DATA, AXIS_FSDP, AXIS_TENSOR))


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (the reference's 2x8 Accelerate+hostfile config,
    SURVEY §2.7#29): call once per host before creating the mesh; the same
    (dp, fsdp, tp) mesh then spans slices over DCN.  No-ops on one host."""
    import os

    if coordinator is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over dp x fsdp (FSDP semantics)."""
    return NamedSharding(mesh, P((AXIS_DATA, AXIS_FSDP)))


def constrain_batch(x):
    """Pin an activation — and, because with_sharding_constraint is its own
    transpose, its COTANGENT — to batch sharding over (dp, fsdp).

    Under a dp x fsdp mesh GSPMD sometimes computes an FSDP-sharded weight
    gradient by resharding the activation cotangent batch->feature; that
    reshard crosses transposed mesh axes ([dp,fsdp] -> [fsdp]x[dp]-replicated)
    which no single collective expresses, so the partitioner falls back to
    "involuntary full rematerialization" (observed on the perceiver k/v
    cotangents and the audio norm_q cotangent in the 42L FSDP train step).
    Constraining the cotangent to batch sharding forces the batch-local
    partial-dW + reduce-scatter strategy instead.

    No-op unless an ambient mesh with (dp, fsdp) axes is set via
    `jax.set_mesh` (see Trainer.jit_train_step(mesh=...)), so inference
    paths and meshless tests are untouched.
    """
    try:
        m = jax.sharding.get_abstract_mesh()
        if (m is None or getattr(m, "empty", True)
                or AXIS_DATA not in m.axis_names
                or AXIS_FSDP not in m.axis_names):
            return x
    except Exception:       # noqa: BLE001 — older jax: no ambient mesh API
        return x
    spec = P(*([(AXIS_DATA, AXIS_FSDP)] + [None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
