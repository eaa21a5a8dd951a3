"""Input-pipeline throughput benchmark (VERDICT r2 item 7).

Measures whether the host can feed the chip: synthesizes an N-image
NOCS-format directory at 480x640, then times

  1. raw PNG decode: native libpng (native/fpcnn_native.so) vs PIL;
  2. full NOCSDataset.__getitem__ (decode + meta + dense/instance GT),
     un-augmented / photometric-only / full train compose (perspective on);
  3. PrefetchLoader epoch throughput at batch 8 for the thread and
     process backends across worker counts,

and compares against the device demand (283 imgs/s e2e inference,
~80 imgs/s stage-2 training at batch 2). Results go into BASELINE.md.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/bench_loader.py \
      [--images 200] [--batch 8] [--workers 1,2,4]

Note: this sandbox has ONE host core, so pooled numbers here measure
per-core cost (scaling across workers is what a real multi-core host
buys; the process backend exists because the numpy augmentation ops hold
the GIL and threads cannot scale them).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, repeat=1):
    t0 = time.perf_counter()
    for _ in range(repeat):
        fn(*args)
    return (time.perf_counter() - t0) / repeat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", default="1,2,4")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args()

    from fastposecnn_tpu.data import native_loader as nl
    from fastposecnn_tpu.data.augment import AugmentConfig
    from fastposecnn_tpu.data.loader import PrefetchLoader
    from fastposecnn_tpu.data.nocs import NOCSDataset
    from fastposecnn_tpu.data.nocs_writer import write_synthetic_nocs
    from fastposecnn_tpu.data.synthetic import SceneConfig

    results = {"n_images": args.images, "hw": [args.height, args.width],
               "host_cores": os.cpu_count()}

    tmp = tempfile.mkdtemp(prefix="fpcnn_loaderbench_")
    scfg = SceneConfig(height=args.height, width=args.width,
                       render_pose_cues=True, max_instances=8)
    t0 = time.perf_counter()
    root = write_synthetic_nocs(tmp, args.images, 0, scfg)
    results["synthesis_s"] = round(time.perf_counter() - t0, 1)

    ds = NOCSDataset(root, dataset_name="CAMERA", max_instances=8)
    fps = ds.images_fps[: min(50, len(ds))]

    # 1. raw decode
    from PIL import Image

    def pil_decode():
        for fp in fps:
            np.asarray(Image.open(fp).convert("RGB"))

    dt = timed(pil_decode)
    results["decode_pil_imgs_per_s"] = round(len(fps) / dt, 1)
    if nl.available():
        def native_decode():
            for fp in fps:
                nl.decode_png(str(fp))

        dt = timed(native_decode)
        results["decode_native_imgs_per_s"] = round(len(fps) / dt, 1)
    else:
        results["decode_native_imgs_per_s"] = None

    # 2. __getitem__ variants
    n_probe = min(50, len(ds))

    def getitems(dataset):
        for i in range(n_probe):
            dataset[i]

    dt = timed(getitems, ds)
    results["getitem_plain_imgs_per_s"] = round(n_probe / dt, 1)

    ds_photo = NOCSDataset(root, dataset_name="CAMERA", max_instances=8,
                           augmentation="train",
                           aug_cfg=AugmentConfig(perspective_p=0.0))
    dt = timed(getitems, ds_photo)
    results["getitem_photometric_imgs_per_s"] = round(n_probe / dt, 1)

    ds_full = NOCSDataset(root, dataset_name="CAMERA", max_instances=8,
                          augmentation="train",
                          aug_cfg=AugmentConfig(perspective_p=1.0))
    dt = timed(getitems, ds_full)
    results["getitem_full_aug_imgs_per_s"] = round(n_probe / dt, 1)

    # 3. loader epoch throughput
    workers = [int(w) for w in args.workers.split(",")]
    for backend in ("thread", "process"):
        for aug, dset in (("noaug", ds), ("photo", ds_photo)):
            for nw in workers:
                loader = PrefetchLoader(dset, args.batch, shuffle=False,
                                        num_workers=nw, backend=backend)
                t0 = time.perf_counter()
                n = 0
                for b in loader:
                    if b is not None:
                        n += b["image"].shape[0]
                dt = time.perf_counter() - t0
                key = f"loader_{backend}_{aug}_w{nw}_imgs_per_s"
                results[key] = round(n / dt, 1)

    results["device_demand_infer_imgs_per_s"] = 283
    results["device_demand_train_imgs_per_s"] = 80
    print(json.dumps(results, indent=2))

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
