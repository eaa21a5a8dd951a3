"""Diagnose the 3D-IoU~0 symptom: decompose matched-pair IoU into
(scales, R, T) error contributions on the converged ROT3_FULL2 checkpoint.

Runs the full eval pipeline on the synthetic val set and prints, per
matched instance: gt vs pred scales / T / quat-distance, plus IoU under
component swaps (pred full; gt RT + pred scales; pred RT + gt scales).
"""

import pathlib
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from fastposecnn_tpu import geometry
from fastposecnn_tpu.config import HParams, pipeline_config_from
from fastposecnn_tpu import constants
from fastposecnn_tpu.data.nocs import NOCSDataset
from fastposecnn_tpu.data.nocs_writer import write_synthetic_nocs
from fastposecnn_tpu.data.synthetic import SceneConfig
from fastposecnn_tpu.models import PoseRegressorNet
from fastposecnn_tpu.train import checkpoint as ckpt
from fastposecnn_tpu.train import optim
from fastposecnn_tpu.train.staged import stage_dataset, _gather_batch
from fastposecnn_tpu.train.task import create_train_state, make_eval_step

RUN = pathlib.Path(
    "logs/26-08-17/10-45-ROT3_FULL2-PoseRegressor-CAMERA-resnet18-imagenet"
)

hp = HParams.load(RUN / "HPARAM.json")
hp.BATCH_SIZE = 8
pcfg = pipeline_config_from(hp)

scfg = SceneConfig(
    height=hp.IMAGE_HEIGHT, width=hp.IMAGE_WIDTH,
    num_classes=hp.num_classes, max_instances=hp.MAX_INSTANCES,
    render_pose_cues=True,
)
tmp = pathlib.Path(tempfile.mkdtemp(prefix="diag_iou_"))
valid_dir = write_synthetic_nocs(tmp / "valid", 32, int(__import__("os").environ.get("DIAG_SEED", "1")), scfg)
valid_ds = NOCSDataset(
    valid_dir, max_size=32, dataset_name=hp.DATASET_NAME,
    selected_classes=hp.SELECTED_CLASSES, max_instances=hp.MAX_INSTANCES,
    augmentation=None,
)
staged = stage_dataset(valid_ds)
n = staged["image"].shape[0]
print(f"staged {n} val samples")

net = PoseRegressorNet(num_classes=hp.num_classes, encoder_name=hp.ENCODER,
                       dtype=jnp.float32)
optimizer = optim.make_optimizer(hp)
state = create_train_state(net, optimizer, jax.random.key(0), hp)
state, hp = ckpt.load_checkpoint(str(RUN / "checkpoints" / __import__("os").environ.get("DIAG_CKPT", "best")), state, hp)
print("checkpoint loaded, step", int(state.step))

inv_K = jnp.asarray(
    np.linalg.inv(constants.scaled_intrinsics(hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH)), jnp.float32
)

from fastposecnn_tpu.ops.matching import gather_matched, match_instances
from fastposecnn_tpu.pipeline import run_pipeline
from fastposecnn_tpu.train.task import MATCH_KEYS, upcast_batch


@jax.jit
def run_match(state, batch, rng):
    batch = upcast_batch(batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    logits = net.apply(variables, batch["image"], train=False)
    out = run_pipeline(logits, rng, pcfg, inv_K)
    match = match_instances(out["aggregated"], batch["agg"])
    return gather_matched(out["aggregated"], batch["agg"], match,
                          keys=MATCH_KEYS)


rng = jax.random.key(0)
rows = []
B = hp.BATCH_SIZE
for b0 in range(0, n - n % B, B):
    idxs = np.arange(b0, b0 + B, dtype=np.int32)
    sv = jnp.ones((B,), jnp.float32)
    batch = _gather_batch(jax.device_put(staged), idxs, sv)
    m = jax.device_get(run_match(state, batch, rng))
    valid = m["valid"].astype(bool).reshape(-1)
    for i in np.nonzero(valid.ravel())[0]:
        flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in m.items()}
        gt_RT = flat["gt_RT"][i]
        pr_RT = flat["pred_RT"][i]
        gt_s = flat["gt_scales"][i]
        pr_s = flat["pred_scales"][i]
        gt_T = flat["gt_T"][i]
        pr_T = flat["pred_T"][i]
        iou_full = float(geometry.asymmetric_3d_iou(
            jnp.asarray(gt_RT), jnp.asarray(pr_RT),
            jnp.asarray(gt_s), jnp.asarray(pr_s)))
        iou_scales_only = float(geometry.asymmetric_3d_iou(
            jnp.asarray(gt_RT), jnp.asarray(gt_RT),
            jnp.asarray(gt_s), jnp.asarray(pr_s)))
        iou_rt_only = float(geometry.asymmetric_3d_iou(
            jnp.asarray(gt_RT), jnp.asarray(pr_RT),
            jnp.asarray(gt_s), jnp.asarray(gt_s)))
        qd = float(geometry.quat_distance_deg(
            jnp.asarray(flat["gt_quaternion"][i][None]),
            jnp.asarray(flat["pred_quaternion"][i][None]),
            jnp.asarray(flat["symmetric_ids"][i][None]))[0])
        rows.append(dict(
            iou=iou_full, iou_s=iou_scales_only, iou_rt=iou_rt_only,
            gt_s=gt_s, pr_s=pr_s, gt_T=gt_T, pr_T=pr_T, qd=qd,
        ))

print(f"\n{len(rows)} matched instances")
if rows:
    for r in rows[:12]:
        print(
            f"IoU={r['iou']:.3f} IoU(scales-only)={r['iou_s']:.3f} "
            f"IoU(RT-only)={r['iou_rt']:.3f} qd={r['qd']:.1f}deg\n"
            f"   gt_s={np.round(r['gt_s'],3)} pr_s={np.round(r['pr_s'],3)}\n"
            f"   gt_T={np.round(r['gt_T'],3)} pr_T={np.round(r['pr_T'],3)}"
        )
    ious = np.array([r["iou"] for r in rows])
    print("\nmean IoU", ious.mean(), " >0.25:", (ious > 0.25).mean())
    print("mean IoU(scales-only)", np.mean([r["iou_s"] for r in rows]))
    print("mean IoU(RT-only)", np.mean([r["iou_rt"] for r in rows]))
    print("mean qd", np.mean([r["qd"] for r in rows]))
    print("mean |gt_T - pr_T|", np.mean(
        [np.linalg.norm(r["gt_T"] - r["pr_T"]) for r in rows]))
