"""Measure per-loss-term gradient norms into the dense xy field.

Hypothesis: the matched xy loss backprops through the voting LSQ solve
(refine_centers_dense -> _solve_sym2x2); near-singular inlier geometry
makes that Jacobian explode, poisoning the xy field (observed: dense xy
L1 ~4.2 on train-distribution scenes, WORSE than a zero field's ~1.27).
The reference has the identical structure (ransac_voting_gpu.py
ransac_voting_layer_v3 builds the final LSQ from differentiable tensors
and b_inv = torch.inverse), so this is a shared pathology, not a port
bug — measure before deciding to deviate."""
import pathlib, sys, tempfile, os
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from fastposecnn_tpu.config import HParams, pipeline_config_from
from fastposecnn_tpu import constants, losses as L
from fastposecnn_tpu.data.nocs import NOCSDataset
from fastposecnn_tpu.data.nocs_writer import write_synthetic_nocs
from fastposecnn_tpu.data.synthetic import SceneConfig
from fastposecnn_tpu.models import PoseRegressorNet
from fastposecnn_tpu.train import checkpoint as ckpt
from fastposecnn_tpu.train import optim
from fastposecnn_tpu.train.staged import stage_dataset, _gather_batch
from fastposecnn_tpu.train.task import create_train_state, upcast_batch
from fastposecnn_tpu.ops.matching import gather_matched, match_instances
from fastposecnn_tpu.pipeline import run_pipeline

RUN = pathlib.Path(os.environ["DIAG_RUN"])
hp = HParams.load(RUN / "HPARAM.json"); hp.BATCH_SIZE = 8
for f in ("PERFORM_AGGREGATION", "PERFORM_HOUGH_VOTING",
          "PERFORM_RT_CALCULATION", "PERFORM_MATCHING"):
    setattr(hp, f, True)
pcfg = pipeline_config_from(hp)
scfg = SceneConfig(height=hp.IMAGE_HEIGHT, width=hp.IMAGE_WIDTH,
                   num_classes=hp.num_classes, max_instances=hp.MAX_INSTANCES,
                   render_pose_cues=True)
tmp = pathlib.Path(tempfile.mkdtemp())
vd = write_synthetic_nocs(tmp / "v", 8, int(os.environ.get("DIAG_SEED", "2")),
                          scfg)
ds = NOCSDataset(vd, max_size=8, dataset_name=hp.DATASET_NAME,
                 selected_classes=hp.SELECTED_CLASSES,
                 max_instances=hp.MAX_INSTANCES, augmentation=None)
staged = stage_dataset(ds)
net = PoseRegressorNet(num_classes=hp.num_classes, encoder_name=hp.ENCODER,
                       dtype=jnp.float32)
state = create_train_state(net, optim.make_optimizer(hp), jax.random.key(0), hp)
state, hp = ckpt.load_checkpoint(
    str(RUN / "checkpoints" / os.environ.get("DIAG_CKPT", "periodic")),
    state, hp)
inv_K = jnp.asarray(
    np.linalg.inv(constants.scaled_intrinsics(
        hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH)), jnp.float32)

batch = _gather_batch(jax.device_put(staged),
                      np.arange(8, dtype=np.int32),
                      jnp.ones((8,), jnp.float32))
batch = upcast_batch(batch)
logits0 = net.apply(
    {"params": state.params, "batch_stats": state.batch_stats},
    batch["image"], train=False)


def term_losses(xy_field):
    lg = dict(logits0, xy=xy_field)
    out = run_pipeline(lg, jax.random.key(0), pcfg, inv_K)
    match = match_instances(out["aggregated"], batch["agg"])
    matched = gather_matched(out["aggregated"], batch["agg"], match,
                             keys=("xy",))
    mxy, _ = L.xy_loss(matched, hp.XYLOSS_TYPE)
    _, dlogs = L.dense_supervision(lg, batch["mask"], batch["agg"],
                                   {"xy": 1.0})
    return {"matched_xy": mxy, "dense_xy": dlogs["xy/loss_dense"]}


xyf = logits0["xy"]
for name in ("matched_xy", "dense_xy"):
    val, grad = jax.value_and_grad(
        lambda f, n=name: term_losses(f)[n])(xyf)
    g = np.asarray(grad)
    print(f"{name}: loss={float(val):.3f} grad_into_xy_field "
          f"l2={np.linalg.norm(g):.4g} max|g|={np.abs(g).max():.4g} "
          f"mean|g|={np.abs(g).mean():.4g}")
    # effective training-step scale: weight * grad
    w = hp.XY_WEIGHT if name == "matched_xy" else hp.DENSE_XY_WEIGHT
    print(f"  weighted (w={w}): l2={w*np.linalg.norm(g):.4g} "
          f"max={w*np.abs(g).max():.4g}")
