"""Why do GT instances fail to match at eval? Decompose into: no-overlap,
class-mismatch (smallest-class quirk), or matched."""
import pathlib, sys, tempfile, os
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from fastposecnn_tpu.config import HParams, pipeline_config_from
from fastposecnn_tpu import constants
from fastposecnn_tpu.data.nocs import NOCSDataset
from fastposecnn_tpu.data.nocs_writer import write_synthetic_nocs
from fastposecnn_tpu.data.synthetic import SceneConfig
from fastposecnn_tpu.models import PoseRegressorNet
from fastposecnn_tpu.train import checkpoint as ckpt
from fastposecnn_tpu.train import optim
from fastposecnn_tpu.train.staged import stage_dataset, _gather_batch
from fastposecnn_tpu.train.task import create_train_state, upcast_batch
from fastposecnn_tpu.ops.matching import mask_iou_matrix
from fastposecnn_tpu.pipeline import run_pipeline

RUN = pathlib.Path(os.environ.get(
    "DIAG_RUN",
    "logs/26-08-17/10-45-ROT3_FULL2-PoseRegressor-CAMERA-resnet18-imagenet",
))
hp = HParams.load(RUN / "HPARAM.json"); hp.BATCH_SIZE = 8
# Force the full pipeline on so mask-stage checkpoints can be probed too.
for f in ("PERFORM_AGGREGATION", "PERFORM_HOUGH_VOTING",
          "PERFORM_RT_CALCULATION", "PERFORM_MATCHING"):
    setattr(hp, f, True)
pcfg = pipeline_config_from(hp)
scfg = SceneConfig(height=hp.IMAGE_HEIGHT, width=hp.IMAGE_WIDTH,
                   num_classes=hp.num_classes, max_instances=hp.MAX_INSTANCES,
                   render_pose_cues=True)
tmp = pathlib.Path(tempfile.mkdtemp())
vd = write_synthetic_nocs(tmp / "v", 32, int(os.environ.get("DIAG_SEED","1")), scfg)
ds = NOCSDataset(vd, max_size=32, dataset_name=hp.DATASET_NAME,
                 selected_classes=hp.SELECTED_CLASSES,
                 max_instances=hp.MAX_INSTANCES, augmentation=None)
staged = stage_dataset(ds); n = staged["image"].shape[0]
net = PoseRegressorNet(num_classes=hp.num_classes, encoder_name=hp.ENCODER, dtype=jnp.float32)
state = create_train_state(net, optim.make_optimizer(hp), jax.random.key(0), hp)
state, hp = ckpt.load_checkpoint(str(RUN / "checkpoints" / os.environ.get("DIAG_CKPT","periodic")), state, hp)
inv_K = jnp.asarray(np.linalg.inv(constants.scaled_intrinsics(hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH)), jnp.float32)

@jax.jit
def fwd(state, batch, rng):
    batch = upcast_batch(batch)
    logits = net.apply({"params": state.params, "batch_stats": state.batch_stats},
                       batch["image"], train=False)
    out = run_pipeline(logits, rng, pcfg, inv_K)
    agg = out["aggregated"]
    iou = mask_iou_matrix(batch["agg"]["instance_masks"].astype(jnp.float32),
                          agg["instance_masks"])
    return {"iou": iou, "p_cls": agg["class_ids"], "p_valid": agg["valid"],
            "g_cls": batch["agg"]["class_ids"], "g_valid": batch["agg"]["valid"],
            "mask_pred": out["categorical"]["mask"], "mask_gt": batch["mask"]}

rng = jax.random.key(0)
tot = dict(gt=0, matched=0, cls_mm=0, no_ov=0, pix_acc=[], mask_iou=[])
B = hp.BATCH_SIZE
for b0 in range(0, n - n % B, B):
    idxs = np.arange(b0, b0+B, dtype=np.int32)
    batch = _gather_batch(jax.device_put(staged), idxs, jnp.ones((B,), jnp.float32))
    r = jax.device_get(fwd(state, batch, rng))
    for b in range(B):
        gv = r["g_valid"][b].astype(bool)
        pv = r["p_valid"][b].astype(bool)
        for g in np.nonzero(gv)[0]:
            tot["gt"] += 1
            ious = r["iou"][b, g] * pv
            best = ious.argmax()
            if ious[best] <= 0: tot["no_ov"] += 1; continue
            if r["p_cls"][b, best] == r["g_cls"][b, g]: tot["matched"] += 1
            else: tot["cls_mm"] += 1
    pm, gm = r["mask_pred"], r["mask_gt"]
    tot["pix_acc"].append((pm == gm).mean())
    fgi = ((pm>0)&(gm>0)&(pm==gm)).sum() / max(((pm>0)|(gm>0)).sum(),1)
    tot["mask_iou"].append(fgi)
print(f"GT insts: {tot['gt']}  matched(best-overlap same class): {tot['matched']}"
      f"  class-mismatch: {tot['cls_mm']}  no-overlap: {tot['no_ov']}")
print("pixel acc", np.mean(tot["pix_acc"]), " fg IoU", np.mean(tot["mask_iou"]))
