"""Decompose the matched-xy error: is the ~50 px/coord val L1 a systematic
voting bias or a few catastrophic failures (RANSAC det<1e-6 -> (0,0))
dominating the mean?  Prints per-instance |pred_xy - gt_xy| percentiles,
the failure count, and the same for z/scales/quat for context."""
import pathlib, sys, tempfile, os
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from fastposecnn_tpu.config import HParams, pipeline_config_from
from fastposecnn_tpu import constants, geometry
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
vd = write_synthetic_nocs(tmp / "v", 32, int(os.environ.get("DIAG_SEED", "1")),
                          scfg)
ds = NOCSDataset(vd, max_size=32, dataset_name=hp.DATASET_NAME,
                 selected_classes=hp.SELECTED_CLASSES,
                 max_instances=hp.MAX_INSTANCES, augmentation=None)
staged = stage_dataset(ds); n = staged["image"].shape[0]
net = PoseRegressorNet(num_classes=hp.num_classes, encoder_name=hp.ENCODER,
                       dtype=jnp.float32)
state = create_train_state(net, optim.make_optimizer(hp), jax.random.key(0), hp)
state, hp = ckpt.load_checkpoint(
    str(RUN / "checkpoints" / os.environ.get("DIAG_CKPT", "periodic")),
    state, hp)
inv_K = jnp.asarray(
    np.linalg.inv(constants.scaled_intrinsics(
        hp.DATASET_NAME, hp.IMAGE_HEIGHT, hp.IMAGE_WIDTH)), jnp.float32)


from fastposecnn_tpu import losses as L


@jax.jit
def fwd(state, batch, rng):
    batch = upcast_batch(batch)
    logits = net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], train=False)
    out = run_pipeline(logits, rng, pcfg, inv_K)
    match = match_instances(out["aggregated"], batch["agg"])
    matched = gather_matched(out["aggregated"], batch["agg"], match)
    # Dense-field forensics: raw quat field magnitude over GT fg pixels
    # (the sign-collapse failure mode reads as |field| ~ 0) + dense L1s.
    _, dlogs = L.dense_supervision(
        logits, batch["mask"], batch["agg"],
        {"quaternion": 1.0, "xy": 1.0, "z": 1.0, "scales": 1.0})
    qf = L._gt_class_select(logits["quaternion"], batch["mask"], 4)
    fg = (batch["mask"] > 0).astype(jnp.float32)
    qmag = jnp.sum(jnp.linalg.norm(qf, axis=-1) * fg) / jnp.maximum(
        jnp.sum(fg), 1.0)
    dlogs = dict(dlogs, quat_field_norm=qmag)
    return matched, dlogs


rng = jax.random.key(0)
rows = []
B = hp.BATCH_SIZE
for b0 in range(0, n - n % B, B):
    idxs = np.arange(b0, b0 + B, dtype=np.int32)
    batch = _gather_batch(jax.device_put(staged), idxs,
                          jnp.ones((B,), jnp.float32))
    m, dlogs = jax.device_get(fwd(state, batch, rng))
    if b0 == 0:
        print("dense:", {k.split("/")[0]: round(float(v), 3)
                         for k, v in dlogs.items()})
    v = m["valid"].astype(bool)
    for b, g in zip(*np.nonzero(v)):
        gxy, pxy = m["gt_xy"][b, g], m["pred_xy"][b, g]
        q_dot = abs(float(np.dot(m["gt_quaternion"][b, g],
                                 m["pred_quaternion"][b, g])))
        ang = 2 * np.degrees(np.arccos(np.clip(q_dot, 0, 1)))
        rows.append(dict(
            ex=abs(float(gxy[0] - pxy[0])), ey=abs(float(gxy[1] - pxy[1])),
            pxy=tuple(np.round(pxy, 1)),
            ez=abs(float(np.log(max(m["gt_z"][b, g], 1e-8))
                         - np.log(max(m["pred_z"][b, g], 1e-8)))),
            es=float(np.abs(m["gt_scales"][b, g]
                            - m["pred_scales"][b, g]).sum()),
            deg=float(ang), sym=int(m["symmetric_ids"][b, g]),
        ))

ex = np.array([r["ex"] + r["ey"] for r in rows])
fails = sum(1 for r in rows if abs(r["pxy"][0]) < 1 and abs(r["pxy"][1]) < 1)
deg = np.array([r["deg"] for r in rows if not r["sym"]])
print(f"matched instances: {len(rows)}   vote-failures at (0,0): {fails}")
print("xy |err| sum px   p50 {:.1f}  p90 {:.1f}  p99 {:.1f}  mean {:.1f}".format(
    *np.percentile(ex, [50, 90, 99]), ex.mean()))
print("log-z |err|       p50 {:.3f}  p90 {:.3f}  mean {:.3f}".format(
    *np.percentile([r["ez"] for r in rows], [50, 90]),
    np.mean([r["ez"] for r in rows])))
print("scales L1 sum     p50 {:.3f}  p90 {:.3f}  mean {:.3f}".format(
    *np.percentile([r["es"] for r in rows], [50, 90]),
    np.mean([r["es"] for r in rows])))
print("rotation deg (nonsym) p50 {:.1f}  p90 {:.1f}  mean {:.1f}  n {}".format(
    *np.percentile(deg, [50, 90]), deg.mean(), len(deg)))
worst = sorted(rows, key=lambda r: -(r["ex"] + r["ey"]))[:8]
for r in worst:
    print("worst xy: err=({:.1f},{:.1f}) pred_xy={} deg={:.0f}".format(
        r["ex"], r["ey"], r["pxy"], r["deg"]))
