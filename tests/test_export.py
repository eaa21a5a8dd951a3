"""StableHLO export round-trip (the reference's onnx_tools analogue)."""

import jax
import jax.numpy as jnp
import numpy as np

from fastposecnn_tpu.models import PoseRegressorNet
from fastposecnn_tpu.utils.export import export_forward, load_exported


class TestExport:
    def test_network_roundtrip(self, tmp_path):
        net = PoseRegressorNet(num_classes=3)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32
        )
        v = net.init(jax.random.key(0), x)
        p = export_forward(net, v, tmp_path / "m.jaxexport",
                           image_shape=(1, 32, 32, 3))
        fn = load_exported(p)
        out = fn(v, x)
        ref = net.apply(v, x)
        np.testing.assert_allclose(
            np.asarray(out["mask"]), np.asarray(ref["mask"]), atol=1e-5
        )

    def test_full_pipeline_export(self, tmp_path):
        from fastposecnn_tpu.pipeline import PipelineConfig

        net = PoseRegressorNet(num_classes=3)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        v = net.init(jax.random.key(0), x)
        pcfg = PipelineConfig(max_instances=4, max_points=64,
                              hv_num_hypotheses=16, use_pallas=False)
        inv_K = np.linalg.inv(np.asarray([[60.0, 0, 16], [0, 60, 16], [0, 0, 1]]))
        p = export_forward(net, v, tmp_path / "full.jaxexport",
                           image_shape=(1, 32, 32, 3),
                           pipeline_config=pcfg, inv_intrinsics=inv_K)
        fn = load_exported(p)
        mask, cls, xy, z, RT = fn(v, x)
        assert mask.shape == (1, 32, 32)
        assert RT.shape == (1, 4, 4, 4)
