"""A/B probe: cost of area-ranked instance selection at 480p (batch 2).

Round-3 added a full-image `segment_sum` pixel-area histogram to
`ops/connected_components.py::extract_instances` (VERDICT r2 #4). The
stage-2 step regressed 24.4 -> 45 ms over the same commit range and the
step trace shows a 5.4 ms/step kCustom scatter on f32[614400] — TPU
scatters serialize per update. This probe isolates extract_instances:

  exact    — current code (segment_sum histogram over all H*W pixels)
  sampled  — stride-4 subsampled histogram + epsilon keep-all score
             (large-component ranking preserved; <=K components still
             keep-all because every root keeps a positive epsilon score)
  firstN   — no histogram at all: first K roots in row-major order
             (round-2 behavior, noise-fragile — lower bound)

Method: median XLA-Modules device span from an xplane trace (wall-clock
of single jitted calls through the axon tunnel is unreliable; in-jit
fori timing gets DCE'd — see the verify skill notes).
"""

import glob
import os
import pathlib
import shutil
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "upb")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fastposecnn_tpu.ops.connected_components import (
    _BIG, extract_instances, label_components as label,
)

H, W, B, K = 480, 640, 2, 16


def device_time_ms(fn, *args, tag="fn", iters=5):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    out = jax.block_until_ready(fn(*args))
    trace_dir = f"/tmp/probe_trace_{tag}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    f = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    times = []
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Modules" not in line.name:
                continue
            for e in line.events:
                name = plane.event_metadata[e.metadata_id].name
                if "jit" in name and "threefry" not in name \
                        and "convert" not in name:
                    times.append(e.duration_ps / 1e9)
    times.sort()
    return times[len(times) // 2] if times else float("nan")


def _select(lbl, score, lin, hw):
    def pick_largest(taken, _):
        avail = jnp.where(taken, -1.0, score)
        best = jnp.max(avail)
        cand = jnp.where((avail == best) & (best > 0.0), lin, _BIG)
        root = jnp.min(cand)
        return taken | (lin == root), root

    _, roots = lax.scan(
        pick_largest, jnp.zeros((hw,), bool), None, length=K
    )
    roots = jnp.sort(roots)
    valid = roots != _BIG
    flat = lbl.reshape(-1)
    masks = (flat[None, :] == roots[:, None]) & valid[:, None]
    return masks.reshape(K, H, W).astype(jnp.float32), valid, roots


def extract_exact(labels):
    """Round-3 shipped code: full-image segment_sum histogram (the 5.4 ms
    regression). Kept here verbatim as the A-side of the probe."""
    hw = H * W

    def per_image(lbl):
        flat = lbl.reshape(-1)
        lin = jnp.arange(hw, dtype=jnp.int32)
        is_root = flat == lin
        fg = flat >= 0
        areas = jax.ops.segment_sum(
            fg.astype(jnp.float32), jnp.where(fg, flat, 0), num_segments=hw
        )
        score = jnp.where(is_root, areas, -1.0)
        return _select(lbl, score, lin, hw)

    return jax.vmap(per_image)(labels)


def extract_sampled(labels, stride=4):
    hw = H * W

    def per_image(lbl):
        flat = lbl.reshape(-1)
        lin = jnp.arange(hw, dtype=jnp.int32)
        is_root = flat == lin
        sub = lbl[::stride, ::stride].reshape(-1)
        fg = sub >= 0
        areas = jax.ops.segment_sum(
            fg.astype(jnp.float32), jnp.where(fg, sub, 0), num_segments=hw
        )
        # epsilon < one sample keeps every root eligible (keep-all for
        # <=K components) while sampled areas dominate the ranking.
        score = jnp.where(is_root, areas + 0.5, -1.0)
        return _select(lbl, score, lin, hw)

    return jax.vmap(per_image)(labels)


def extract_firstn(labels):
    hw = H * W

    def per_image(lbl):
        flat = lbl.reshape(-1)
        lin = jnp.arange(hw, dtype=jnp.int32)
        is_root = flat == lin
        score = jnp.where(is_root, 1.0, -1.0)
        return _select(lbl, score, lin, hw)

    return jax.vmap(per_image)(labels)


def main():
    rng = np.random.default_rng(0)
    # Realistic early-training mask: blobby foreground, several components.
    fg = np.zeros((B, H, W), bool)
    for b in range(B):
        for _ in range(24):
            cy, cx = rng.integers(20, H - 20), rng.integers(20, W - 20)
            r = int(rng.integers(3, 40))
            yy, xx = np.ogrid[:H, :W]
            fg[b] |= (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    fg = jnp.asarray(fg)

    lbl = jax.block_until_ready(jax.jit(label)(fg))

    lab_j = jax.jit(label)
    exact_j = jax.jit(extract_exact)
    sampled_j = jax.jit(extract_sampled)
    firstn_j = jax.jit(extract_firstn)
    # The landed round-4 fix (adaptive-stride sampled histogram).
    landed_j = jax.jit(lambda l: extract_instances(l, K, return_roots=True))

    if jax.default_backend() == "tpu":
        t_lab = device_time_ms(lab_j, fg, tag="label")
        t_exact = device_time_ms(exact_j, lbl, tag="exact")
        t_sampled = device_time_ms(sampled_j, lbl, tag="sampled")
        t_firstn = device_time_ms(firstn_j, lbl, tag="firstn")
        t_landed = device_time_ms(landed_j, lbl, tag="landed")
        print(f"label (CC)      : {t_lab:7.3f} ms")
        print(f"extract exact   : {t_exact:7.3f} ms")
        print(f"extract sampled : {t_sampled:7.3f} ms")
        print(f"extract firstN  : {t_firstn:7.3f} ms")
        print(f"extract landed  : {t_landed:7.3f} ms")
    else:
        print("non-TPU backend: skipping device timing (smoke mode)")
        for f, a in ((exact_j, lbl), (sampled_j, lbl), (firstn_j, lbl),
                     (landed_j, lbl)):
            jax.block_until_ready(f(a))

    # Agreement check on this input: sampled must keep the same large
    # components as exact (areas differ, set of kept roots should match
    # for well-separated sizes).
    me, ve, re_ = jax.device_get(exact_j(lbl))
    ms, vs, rs = jax.device_get(sampled_j(lbl))
    ml, vl, rl = jax.device_get(landed_j(lbl))
    for b in range(B):
        a = set(re_[b][ve[b]].tolist())
        s = set(rs[b][vs[b]].tolist())
        ld = set(rl[b][vl[b]].tolist())
        print(f"img{b}: exact keeps {len(a)}, sampled keeps {len(s)}, "
              f"landed keeps {len(ld)}, "
              f"jaccard(exact,sampled) {len(a & s) / max(1, len(a | s)):.2f}, "
              f"jaccard(exact,landed) {len(a & ld) / max(1, len(a | ld)):.2f}")


if __name__ == "__main__":
    main()
