"""Multi-host execution: process-group init + DCN-aware meshes.

TPU-native replacement for the reference's torchrun DDP launch
(/root/reference/qlora.py:300-304, LOCAL_RANK + NCCL): here
``jax.distributed.initialize`` forms the process group, every process
contributes its local chips to one global ``jax.sharding.Mesh``, and XLA
emits the collectives — dp over DCN (between hosts), fsdp/tp over ICI
(within a host/slice), matching the scaling-book recipe: batch-gradient
all-reduces are the only DCN traffic, weight gathers stay on ICI.

Launch (per host)::

    python -m qlora_tpu.cli ... \
        --coordinator_address=host0:1234 --num_processes=N --process_id=i

or rely on the TPU runtime's automatic environment (GKE/queued resources),
where ``initialize()`` needs no arguments.

All of this is testable without hardware: tests spawn N CPU processes with
``--xla_force_host_platform_device_count`` and assert loss parity with the
single-process step (tests/test_multihost.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from qlora_tpu.parallel.mesh import MeshAxes


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list] = None,
) -> bool:
    """Form the multi-host process group (idempotent; no-op single-process).

    Returns True if running multi-process after the call.  With no arguments
    on a TPU pod runtime, jax.distributed discovers the topology itself.
    """
    if num_processes is not None and num_processes <= 1:
        return False
    if coordinator_address is None and num_processes is None:
        # nothing requested and no pod env → single process
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_count() > 1


def make_global_mesh(axes: MeshAxes) -> Mesh:
    """A (dp, fsdp, tp) mesh over ALL processes' devices, laid out so dp is
    the outermost (DCN-crossing) axis and fsdp×tp stay within a process
    (ICI) whenever the factorization allows.

    Requires dp to be a multiple of process_count when fsdp*tp ≤ local
    device count (the normal regime): each process then contributes
    dp/process_count full fsdp×tp blocks and gradient psums are the only
    inter-host traffic.
    """
    devices = jax.devices()  # global, ordered by process
    n = axes.dp * axes.fsdp * axes.tp
    if n > len(devices):
        raise ValueError(f"mesh {axes} needs {n} devices, have {len(devices)}")
    # jax.devices() is ordered by process, so a dp-major reshape IS the
    # DCN-aware layout in the regular regime (fsdp*tp divides the local
    # device count and dp covers whole processes): each dp slice is one
    # process's chips and fsdp/tp collectives ride ICI.  In the irregular
    # regime no relabeling can avoid cross-process fsdp/tp groups (a group
    # larger than a host physically spans hosts), so warn instead of
    # silently shipping weight-gathers over DCN.
    arr = np.asarray(devices[:n]).reshape(axes.dp, axes.fsdp, axes.tp)
    if jax.process_count() > 1:
        procs = np.asarray([d.process_index for d in devices[:n]]).reshape(
            axes.dp, axes.fsdp, axes.tp
        )
        spans = any(len(np.unique(procs[d])) > 1 for d in range(axes.dp))
        if spans:
            import warnings

            warnings.warn(
                f"mesh {axes}: fsdp×tp groups span multiple processes — "
                "weight-gather/psum collectives will cross DCN (slow). "
                "Prefer fsdp*tp ≤ local device count with dp a multiple of "
                "the process count.",
                stacklevel=2,
            )
    return Mesh(arr, ("dp", "fsdp", "tp"))


def global_batch_from_local(mesh: Mesh, local_batch: dict) -> dict:
    """Assemble a global device array from each process's local batch shard.

    Every process passes its own [local_B, S] arrays; the result is a global
    [global_B, S] array sharded over the mesh's (dp, fsdp) data axes —
    the multi-host analog of DistributedSampler + DDP input sharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def one(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(("dp", "fsdp"), *([None] * (x.ndim - 1))))
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return {k: one(v) for k, v in local_batch.items()}


@dataclasses.dataclass
class ProcessInfo:
    process_id: int
    process_count: int
    local_devices: int
    global_devices: int


def process_info() -> ProcessInfo:
    return ProcessInfo(
        process_id=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
    )
