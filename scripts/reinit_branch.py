"""Surgically re-initialize one head branch of a trained checkpoint.

Usage:
  DIAG_RUN=<run dir> BRANCH=rotation OUT=<new ckpt dir> python
  scripts/reinit_branch.py

Loads the latest periodic checkpoint, replaces `<branch>_decoder` +
`<branch>_head` params with a fresh init (and resets the optimizer state
for the whole tree via a fresh opt init restored for unchanged params? --
no: optimizer moments are reset ONLY for the reinitialized subtrees; the
rest keep their Adam state), and saves a new checkpoint the train CLI can
--resume from. Rationale: a branch trained for ~170 epochs on
contradictory targets (the quaternion hemisphere bug) sits in a drifted
basin with large second moments; fresh init + zeroed moments converges
far faster than digging out.
"""
import os, pathlib, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from fastposecnn_tpu.config import HParams
from fastposecnn_tpu.models import PoseRegressorNet
from fastposecnn_tpu.train import checkpoint as ckpt
from fastposecnn_tpu.train import optim
from fastposecnn_tpu.train.task import create_train_state

RUN = pathlib.Path(os.environ["DIAG_RUN"])
BRANCH = os.environ.get("BRANCH", "rotation")
OUT = pathlib.Path(os.environ["OUT"])
SEED = int(os.environ.get("SEED", "7"))

hp = HParams.load(RUN / "HPARAM.json")
net = PoseRegressorNet(num_classes=hp.num_classes, encoder_name=hp.ENCODER,
                       dtype=jnp.float32)
state = create_train_state(net, optim.make_optimizer(hp),
                           jax.random.key(SEED), hp)
fresh = create_train_state(net, optim.make_optimizer(hp),
                           jax.random.key(SEED + 1), hp)
state, hp = ckpt.load_checkpoint(str(RUN / "checkpoints" / "periodic"),
                                 state, hp)

targets = {f"{BRANCH}_decoder", f"{BRANCH}_head"}


def graft(loaded, freshv):
    """Replace target top-level subtrees of any params-shaped dict."""
    out = dict(loaded)
    for k in targets:
        if k in out:
            out[k] = freshv[k]
    return out


def map_state(ls, fs):
    # TrainState pytree: params, batch_stats, opt_state (chain of optax
    # states whose leaves mirror params), step, skipped_updates. Any dict
    # node carrying the params-shaped top level (params, BN stats, Adam
    # mu/nu) gets the target subtrees grafted with FRESH values; array
    # leaves (step, counts) keep the loaded value.
    def rec(l, f):
        if isinstance(l, dict) and targets & set(l.keys()):
            return graft(l, f)
        if isinstance(l, dict):
            return {k: rec(l[k], f[k]) for k in l}
        if hasattr(l, "_fields"):  # NamedTuple (TrainState, optax states)
            return type(l)(*(rec(getattr(l, n), getattr(f, n))
                             for n in l._fields))
        if isinstance(l, (list, tuple)):
            return type(l)(rec(a, b) for a, b in zip(l, f))
        return l
    return rec(ls, fs)


new_state = map_state(state, fresh)
# sanity: target params actually changed, others untouched
a = np.asarray(state.params[f"{BRANCH}_head"]["conv"]["kernel"])
b = np.asarray(new_state.params[f"{BRANCH}_head"]["conv"]["kernel"])
assert not np.allclose(a, b), "target branch was not reinitialized"
ae = np.asarray(state.params["encoder"]["conv1"]["kernel"])
be = np.asarray(new_state.params["encoder"]["conv1"]["kernel"])
assert np.array_equal(ae, be), "encoder should be untouched"

OUT.mkdir(parents=True, exist_ok=True)
step = int(jax.device_get(new_state.step))
ckpt.save_checkpoint(OUT, step, new_state, hp)
print(f"reinitialized {sorted(targets)} -> {OUT} (step {step})")
