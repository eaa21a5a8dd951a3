"""Device mesh + sharding helpers: the TPU replacement for DDP.

The reference's only multi-device strategy is PyTorch-Lightning 'ddp'
(FPC/config.py:60, train.py:316-327) — NCCL allreduce over per-process
replicas. Here data parallelism is expressed with `jax.sharding`: one global
jit-compiled step, batch sharded over the 'dp' mesh axis, parameters
replicated; XLA inserts the gradient all-reduce over ICI automatically. A
'tp' axis is reserved for tensor-parallel sharding of wide decoder channels
(unused by the reference model scale, wired for bigger backbones).

Metric reduction across devices (the reference's dist_reduce_fx='sum',
FPC/lib/metrics.py:19-20) is free here: metric states live in the same
global program, so sums are already global.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, dp: Optional[int] = None, tp: int = 1
) -> Mesh:
    """Build a ('dp', 'tp') mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if dp is None:
        dp = n_devices // tp
    assert dp * tp == n_devices, (dp, tp, n_devices)
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with its leading axis split over 'dp'.

    Single-process path: every device is addressable, so a plain
    device_put suffices. For multi-host slices use
    `shard_batch_multihost`.
    """
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_batch_multihost(local_batch, mesh: Mesh):
    """Assemble a GLOBAL batch from per-process local shards.

    Multi-host training (a TPU pod slice runs one process per host) feeds
    each process only its slice of the global batch; this builds the global
    jax.Array whose addressable shards are the local data
    (`jax.make_array_from_process_local_data`). The global batch size is
    local_batch_size * process_count. On a single process this degrades to
    `shard_batch` semantics. The reference has no analogue — PL 'ddp'
    (FPC/train.py:316-327) never ran multi-node.
    """
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch,
    )


def make_multislice_mesh(n_slices: int, devices_per_slice: int, tp: int = 1):
    """('slice', 'dp', 'tp') mesh stub for multi-slice (DCN) scaling.

    Data parallelism across slices rides DCN; dp/tp within a slice ride
    ICI. Out of scope for reference parity (SURVEY §2.3/§5) — provided so
    multi-slice deployments have a canonical axis layout to shard over:
    batch over ('slice', 'dp'), parameters replicated.
    """
    devices = jax.devices()
    need = n_slices * devices_per_slice
    assert len(devices) >= need, (len(devices), need)
    dp = devices_per_slice // tp
    assert dp * tp == devices_per_slice, (dp, tp, devices_per_slice)
    arr = np.asarray(devices[:need]).reshape(n_slices, dp, tp)
    return Mesh(arr, axis_names=("slice", "dp", "tp"))


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_state_tp(state, mesh: Mesh, min_channels: int = 128):
    """Place a train state with conv output channels sharded over 'tp'.

    Real tensor parallelism for a convnet, the GSPMD way: every 4-D conv
    kernel [kh, kw, cin, cout] whose cout divides the 'tp' axis size (and is
    at least `min_channels`, so tiny stem/head convs stay replicated) is
    laid out P(None, None, None, 'tp'). XLA then partitions each conv's
    output-channel arithmetic across 'tp' and inserts the activation
    collectives where a consumer needs the full channel axis — no manual
    kernel surgery. The SAME rule is applied to every leaf of the optimizer
    state (radam moments, lookahead slow weights mirror the param tree by
    shape), so optimizer memory scales down with 'tp' too.

    With tp == 1 this degrades to `replicate`. The reference has no model
    parallelism at all (SURVEY §2.3); this is the capability extension for
    backbones too wide for one chip's HBM.
    """
    tp = mesh.shape["tp"]
    if tp == 1:
        return replicate(state, mesh)
    repl = replicated(mesh)
    tp_last = NamedSharding(mesh, P(None, None, None, "tp"))

    def place(x):
        shape = getattr(x, "shape", ())
        if (
            len(shape) == 4
            and shape[-1] % tp == 0
            and shape[-1] >= min_channels
        ):
            return jax.device_put(x, tp_last)
        return jax.device_put(x, repl)

    return jax.tree.map(place, state)
