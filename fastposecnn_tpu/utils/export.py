"""Model export for serving.

Parity: FPC/tools/onnx_tools.py:6-24 (`export_onnx_model`, a thin
torch.onnx.export wrapper, unused by the main path). The TPU-native
equivalent is `jax.export`: the jitted forward (optionally the full
pipeline) is serialized to portable StableHLO bytes that any
XLA-compatible runtime (TPU/GPU/CPU serving stacks) can load without
Python or flax.
"""

from __future__ import annotations

import pathlib
from typing import Optional

import numpy as np


def export_forward(
    net,
    variables,
    path,
    image_shape=(1, 480, 640, 3),
    pipeline_config=None,
    inv_intrinsics: Optional[np.ndarray] = None,
) -> pathlib.Path:
    """Serialize the forward program to StableHLO (`.jaxexport` bytes).

    With `pipeline_config`, the exported program is the full
    image -> (mask, class_ids, xy, z, RT) pipeline; otherwise just the
    dense-logit network.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    if pipeline_config is not None:
        from fastposecnn_tpu.pipeline import run_pipeline

        inv_K = jnp.asarray(inv_intrinsics, jnp.float32)

        def fn(variables, image):
            logits = net.apply(variables, image, train=False)
            out = run_pipeline(logits, jax.random.key(0), pipeline_config, inv_K)
            agg = out["aggregated"]
            return (
                out["categorical"]["mask"],
                agg["class_ids"],
                agg["xy"],
                agg["z"],
                agg["RT"],
            )
    else:

        def fn(variables, image):
            return net.apply(variables, image, train=False)

    image = jax.ShapeDtypeStruct(image_shape, jnp.float32)
    var_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables
    )
    exported = jex.export(jax.jit(fn))(var_shapes, image)
    data = exported.serialize()
    path = pathlib.Path(path)
    path.write_bytes(data)
    return path


def load_exported(path):
    """Deserialize and return a callable (variables, image) -> outputs."""
    from jax import export as jex

    exported = jex.deserialize(pathlib.Path(path).read_bytes())
    return exported.call
