"""End-to-end: evaluate CLI consuming a reference-format torch checkpoint.

This is the full accuracy-parity path a user runs with the released
FastPoseCNN weights (reference README.md:97): Lightning .ckpt -> arch merge
-> full torch->flax conversion -> forward+match -> f64 error math -> APs.
Here the checkpoint is a randomly-initialized torch replica and the data is
synthetic, so the APs are meaningless — the test asserts the machinery runs
end to end and produces the report artifacts.
"""

import pathlib

import numpy as np
import pytest
import torch


@pytest.mark.slow
def test_evaluate_cli_with_torch_checkpoint(tmp_path):
    from fastposecnn_tpu.cli import evaluate as E
    from fastposecnn_tpu.models.torch_ref import TorchPoseRegressor

    torch.manual_seed(0)
    selected = ["bg", "bottle", "bowl"]
    tmodel = TorchPoseRegressor(classes=len(selected)).eval()
    ckpt_path = tmp_path / "released.ckpt"
    torch.save(
        {
            "state_dict": {
                f"model.{k}": v for k, v in tmodel.state_dict().items()
            },
            "hyper_parameters": {
                "MODEL": "PoseRegressor",
                "BACKBONE_ARCH": "FPN",
                "ENCODER": "resnet18",
                "ENCODER_WEIGHTS": "imagenet",
                "SELECTED_CLASSES": selected,
            },
        },
        ckpt_path,
    )

    out_dir = tmp_path / "eval_out"
    E.main([
        "--synthetic", "2",
        "--CHECKPOINT", str(ckpt_path),
        "--IMAGE_HEIGHT", "64", "--IMAGE_WIDTH", "64",
        "--BATCH_SIZE", "2", "--VALID_SIZE", "2",
        "--MAX_INSTANCES", "4", "--MAX_VOTE_POINTS", "128",
        "--HV_NUM_OF_HYPOTHESES", "32", "--NUM_WORKERS", "1",
        "--output", str(out_dir),
    ])

    assert (out_dir / "raw_errors_2.npz").exists()
    assert (out_dir / "all_metrics_2_aps.png").exists()
    raw = np.load(out_dir / "raw_errors_2.npz")
    assert any(k.startswith("3d_iou/") for k in raw.files)
