"""On-device connected-component labeling (4-connectivity) for TPU.

Replaces the reference's CuPy `cupyx.scipy.ndimage.label` call with a
torch->CuPy->DLPack round trip (FPC/lib/aggregation_layer.py:160-183). Here
the whole thing is one jit-safe jnp computation:

  1. every foreground pixel starts labeled with its own linear index;
  2. iterate { 4-neighbor min-propagation; pointer jumping (label <-
     label[label]) } inside `lax.while_loop` until fixpoint. Pointer jumping
     makes convergence ~O(log diameter) instead of O(diameter);
  3. components are canonically labeled by the smallest linear index they
     contain, which matches scipy's row-major first-pixel ordering, so
     label *ordering* agrees with `scipy.ndimage.label` (values are
     compacted to 1..n by `extract_instances`).

Batch safety for free: vmap over the batch axis — the reference needed a
custom 3D structuring element with an all-False batch plane
(aggregation_layer.py:43-59) to stop instances merging across images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_BIG = jnp.iinfo(jnp.int32).max


def _segmented_run_min(lbl: jax.Array, fg: jax.Array, axis: int) -> jax.Array:
    """Per contiguous foreground run along `axis`, broadcast the run minimum.

    Segmented min-scan (forward + backward) via lax.associative_scan — pure
    VPU work, no gathers. Background cells carry _BIG and reset segments.
    """
    reset = ~fg

    def combine(a, b):
        m1, r1 = a
        m2, r2 = b
        return jnp.where(r2, m2, jnp.minimum(m1, m2)), r1 | r2

    fwd, _ = lax.associative_scan(combine, (lbl, reset), axis=axis)
    bwd, _ = lax.associative_scan(combine, (lbl, reset), axis=axis,
                                  reverse=True)
    out = jnp.minimum(fwd, bwd)
    return jnp.where(fg, out, _BIG)


def _label_single(fg: jax.Array, max_iters: int) -> jax.Array:
    """fg: [H, W] bool -> [H, W] int32 root linear index (or -1 on bg).

    Each iteration runs a row pass + column pass of segmented run-min
    scans (one iteration fully labels any x/y-convex component); every 4th
    iteration adds a pointer-jump (label <- label[label]) so serpentine
    components converge in O(log turns) instead of O(turns). Scans are
    gather-free — on TPU the pointer-jump gather was the dominant cost of
    the pure min-propagation formulation.
    """
    h, w = fg.shape
    lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    init = jnp.where(fg, lin, _BIG)

    def pointer_jump(lbl):
        flat = lbl.reshape(-1)
        idx = jnp.where(flat == _BIG, 0, flat)
        jumped = jnp.where(flat == _BIG, _BIG, flat[idx])
        return jumped.reshape(h, w)

    def body(state):
        lbl, _, it = state
        new = _segmented_run_min(lbl, fg, axis=1)
        new = _segmented_run_min(new, fg, axis=0)
        new = lax.cond(it % 4 == 3, pointer_jump, lambda x: x, new)
        return new, jnp.any(new != lbl), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    lbl, _, _ = lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    return jnp.where(fg, lbl, -1)


def label_components(fg: jax.Array, max_iters: int = 64) -> jax.Array:
    """Batched labeling: fg [B, H, W] bool -> [B, H, W] int32 root index / -1.

    `max_iters` bounds the while_loop; with pointer jumping, 64 covers any
    realistic 640x480 mask (worst-case serpentine shapes need ~log2(path)
    jump rounds x small constant).
    """
    return jax.vmap(lambda m: _label_single(m, max_iters))(fg)


def extract_instances(
    labels: jax.Array, max_instances: int
) -> tuple[jax.Array, jax.Array]:
    """Root-index label map [B, H, W] -> padded per-instance binary masks.

    Returns:
      masks: [B, max_instances, H, W] float32 binary instance masks
      valid: [B, max_instances] bool

    Instance slots are ordered by component root (row-major first pixel),
    matching scipy.ndimage.label's 1..n ordering. If an image has more than
    `max_instances` components, the *largest* components are kept (the
    reference keeps all — FPC/lib/aggregation_layer.py:101-108 — but its
    downstream per-instance Python loop is exactly what static shapes
    remove; the cap is configurable).
    """
    b, h, w = labels.shape
    hw = h * w

    def per_image(lbl):
        flat = lbl.reshape(-1)
        fg = flat >= 0
        # Component areas, scatter-added at the root linear index.
        areas = jnp.zeros((hw,), jnp.int32).at[
            jnp.where(fg, flat, 0)
        ].add(fg.astype(jnp.int32))
        is_root = areas > 0
        # Keep the max_instances largest components...
        top_area, top_idx = lax.top_k(areas, max_instances)
        keep = top_area > 0
        # ...but order slots by root index (scipy ordering), pushing invalid
        # slots to the end.
        order = jnp.argsort(jnp.where(keep, top_idx, hw))
        roots = top_idx[order]
        valid = keep[order]
        masks = (flat[None, :] == roots[:, None]) & valid[:, None]
        del is_root
        return masks.reshape(max_instances, h, w).astype(jnp.float32), valid

    return jax.vmap(per_image)(labels)
