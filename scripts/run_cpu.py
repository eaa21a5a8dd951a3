"""Run any fastposecnn_tpu CLI module on the host CPU backend.

The sandbox's sitecustomize imports jax and registers the 'axon' PJRT
plugin (remote TPU tunnel) in EVERY interpreter, so a shell-level
`JAX_PLATFORMS=cpu` is too late — jax is already configured by the time
the CLI module runs, and any "CPU" diagnostic silently contends with
whatever training run owns the chip (observed 00:28 UTC this round: an
npz-validation eval meant for CPU attached to the tunnel mid-chunk).
This wrapper applies the same de-axon dance as tests/conftest.py, then
dispatches to the requested CLI:

    python scripts/run_cpu.py evaluate --synthetic 16 ...
    python scripts/run_cpu.py train -e SMOKE ...
"""

import os
import pathlib
import runpy
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)  # 20x compile slowdown even idle
except Exception:  # noqa: BLE001
    pass
jax.config.update("jax_platforms", "cpu")

if __name__ == "__main__":
    module = sys.argv[1]
    sys.argv = [f"fastposecnn_tpu.cli.{module}"] + sys.argv[2:]
    runpy.run_module(f"fastposecnn_tpu.cli.{module}", run_name="__main__")
