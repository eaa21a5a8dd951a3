"""Convert an orbax checkpoint directory into a durable .npz weight
snapshot (see train/checkpoint.py "Durable npz weight snapshots"), or
verify one restores.

Orbax checkpoints live under gitignored logs/, which VM restarts wipe —
this has now destroyed trained weights twice (the round-3 demo and the
round-4 stage-5 chunk-2 run). The chip queues call this between chunks
and commit the npz so training progress survives any host death.

Usage:
  python scripts/ckpt_snapshot.py save <orbax_ckpt_dir> <out.npz>
  python scripts/ckpt_snapshot.py verify <snapshot.npz>

Runs entirely on CPU (forced before the jax import) so it never contends
for the chip tunnel while a training step could be queued.
"""

import os
import sys

# Force (not setdefault): the sandbox exports JAX_PLATFORMS=axon, and a
# snapshot must never open the chip tunnel while a training step runs.
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_state(hp):
    import dataclasses

    import jax

    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.train import optim
    from fastposecnn_tpu.train.task import create_train_state

    # Param shapes are input-size-independent (fully-convolutional net);
    # init tiny so the 1-core host doesn't pay a 480p CPU forward.
    hp = dataclasses.replace(hp, IMAGE_HEIGHT=64, IMAGE_WIDTH=64)
    net = PoseRegressorNet(num_classes=hp.num_classes,
                           encoder_name=hp.ENCODER)
    optimizer = optim.make_optimizer(hp)
    return create_train_state(net, optimizer, jax.random.key(0), hp)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    mode = argv[0]

    import fastposecnn_tpu.config as C
    from fastposecnn_tpu.train import checkpoint as ckpt

    if mode == "save":
        src, out = argv[1], argv[2]
        hp = ckpt.merge_arch_from_any(src, C.evaluating())
        state = _build_state(hp)
        state, hp = ckpt.load_checkpoint(src, state, hp)
        ckpt.save_npz_snapshot(out, state, hp)
        size_mb = os.path.getsize(out) / 1e6
        print(f"snapshot: {src} -> {out} ({size_mb:.1f} MB)")
        # In-process restore self-check (a separate `verify` invocation
        # costs another ~4 min of jax import + init on the 1-core host —
        # dead chip-idle time inside the chunked training queue).
        import jax
        import numpy as np

        restored, _ = ckpt.load_npz_snapshot(out, state, hp)
        a = np.asarray(jax.tree.leaves(state.params)[0])
        b = np.asarray(jax.tree.leaves(restored.params)[0])
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)
        print("self-check ok: snapshot restores")
    elif mode == "verify":
        path = argv[1]
        hp = ckpt.merge_arch_from_any(path, C.evaluating())
        state = _build_state(hp)
        state, hp = ckpt.load_npz_snapshot(path, state, hp)
        import jax

        n = sum(x.size for x in jax.tree.leaves(state.params))
        print(f"verify ok: {path} restores {n/1e6:.2f}M params "
              f"(ENCODER={hp.ENCODER})")
    else:
        raise SystemExit(f"unknown mode {mode!r} (use save|verify)")


if __name__ == "__main__":
    main()
