"""On-chip kernel / device-path parity check.

CI exercises the Pallas kernels only in interpret mode, which cannot catch
real-Mosaic restrictions (i1 vector concat, sublane divisibility, scoped
vmem limits — exactly the class of failure fixed in commit 8dff1de). This
script runs the custom kernels AND every other device-side numeric path on
the REAL device and asserts they match reference implementations:

  1. vote_counts_pallas vs vote_counts_jnp   (exact: 0/1 float sums)
  2. label_components_pallas vs the segmented-scan path
     (canonical-partition equality + raster-order label equivalence)
  3. soft_vote_centers (soft voting + z-score/IQR pruning) vs a clean-env
     CPU execution of the same traced program
  4. ransac_vanishing_points vs CPU          (same threefry key -> same
     hypotheses on both backends; compares the winning VP + count)
  5. refine_centers_dense (all-pixel LSQ) vs CPU

Checks 3-5 get their references from a subprocess running with
JAX_PLATFORMS=cpu (identical seeded inputs are rebuilt from the shared
generators below), because under the axon sitecustomize the parent
process cannot host a CPU backend.

Run on the TPU host with no env overrides: `python scripts/chip_check.py`.
Exits 0 on pass, 1 on mismatch; prints one status line per check.
"""

import os
import pathlib
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


# -- shared deterministic inputs for checks 3-5 ------------------------------


def make_soft_inputs():
    rng = np.random.default_rng(11)
    m, p = 8, 512
    centers = rng.uniform(16, 48, size=(m, 2)).astype(np.float32)
    pts = rng.uniform(0, 64, size=(m, p, 2)).astype(np.float32)
    d = centers[:, None] - pts
    d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
    # 15% corrupted directions: outliers for the pruning paths to chew on.
    ang = rng.uniform(0, 2 * np.pi, size=(m, p))
    noise = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
    bad = (rng.random((m, p)) < 0.15)[..., None]
    dirs = np.where(bad, noise, d).astype(np.float32)
    active = np.ones((m,), bool)
    pt_valid = rng.random((m, p)) > 0.1
    return pts, dirs, active, pt_valid


def make_vp_inputs():
    rng = np.random.default_rng(13)
    m, p = 8, 256
    # Near-parallel direction bundles -> far vanishing point geometry.
    base = rng.uniform(0, 2 * np.pi, size=(m, 1))
    ang = base + rng.normal(0, 0.05, size=(m, p))
    dirs = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
    pts = rng.uniform(0, 64, size=(m, p, 2)).astype(np.float32)
    active = np.ones((m,), bool)
    pt_valid = rng.random((m, p)) > 0.1
    return pts, dirs, active, pt_valid


def make_dense_inputs():
    rng = np.random.default_rng(17)
    b, n, h, w = 2, 4, 64, 96
    masks = np.zeros((b, n, h, w), np.float32)
    win = np.zeros((b, n, 2), np.float32)
    field = np.zeros((b, h, w, 2), np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    for bi in range(b):
        for ni in range(n):
            cy = rng.integers(12, h - 12)
            cx = rng.integers(12, w - 12)
            masks[bi, ni, cy - 8:cy + 8, cx - 8:cx + 8] = 1.0
            win[bi, ni] = (cx + rng.normal(0, 0.5), cy + rng.normal(0, 0.5))
            dx = cx - xs
            dy = cy - ys
            nrm = np.sqrt(dx * dx + dy * dy) + 1e-9
            reg = masks[bi, ni] > 0
            field[bi, :, :, 0][reg] = (dx / nrm)[reg]
            field[bi, :, :, 1][reg] = (dy / nrm)[reg]
    return win, masks, field


def compute_extended():
    """Run checks 3-5's device programs; returns dict of np arrays.

    No `interpret` knob: these paths contain no Pallas kernels, and under
    `--interpret` (CPU host) the device-vs-CPU comparison is vacuously
    CPU-vs-CPU — main() prints a note in that case."""
    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu.ops.voting import refine_centers_dense
    from fastposecnn_tpu.ops.voting_soft import soft_vote_centers
    from fastposecnn_tpu.ops.voting_vp import ransac_vanishing_points

    out = {}
    key = jax.random.key(123)

    pts, dirs, active, pt_valid = make_soft_inputs()
    for method in ("z-score", "iqr"):
        centers, hyps, pruned = jax.jit(
            lambda k, pt, dr, ac, pv, meth=method: soft_vote_centers(
                k, pt, dr, ac, num_hypotheses=128, pt_valid=pv,
                prun_method=meth,
            )
        )(key, jnp.asarray(pts), jnp.asarray(dirs), jnp.asarray(active),
          jnp.asarray(pt_valid))
        out[f"soft_{method}_centers"] = np.asarray(centers)
        out[f"soft_{method}_pruned"] = np.asarray(pruned)

    pts, dirs, active, pt_valid = make_vp_inputs()
    best, counts = jax.jit(
        lambda k, pt, dr, ac, pv: ransac_vanishing_points(
            k, pt, dr, ac, num_hypotheses=128, pt_valid=pv
        )
    )(key, jnp.asarray(pts), jnp.asarray(dirs), jnp.asarray(active),
      jnp.asarray(pt_valid))
    out["vp_best"] = np.asarray(best)
    out["vp_counts"] = np.asarray(counts)

    win, masks, field = make_dense_inputs()
    refined = jax.jit(
        lambda w_, m_, f_: refine_centers_dense(w_, m_, f_, 0.999)
    )(jnp.asarray(win), jnp.asarray(masks), jnp.asarray(field))
    out["dense_refined"] = np.asarray(refined)
    out["dense_win"] = win
    return out


def canonical(labels: np.ndarray) -> np.ndarray:
    """Relabel [H, W] int labels to first-occurrence order (bg = -1)."""
    out = np.full(labels.shape, -1, np.int64)
    mapping = {}
    flat = labels.ravel()
    cflat = out.ravel()
    for i in range(flat.shape[0]):
        v = flat[i]
        if v < 0:
            continue
        if v not in mapping:
            mapping[v] = len(mapping)
        cflat[i] = mapping[v]
    return out


def main() -> int:
    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu.ops.connected_components import label_components
    from fastposecnn_tpu.ops.voting import vote_counts_jnp, vote_counts_pallas

    interpret = "--interpret" in sys.argv  # CPU plumbing smoke only
    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}")
    if backend != "tpu" and "axon" not in backend and not interpret:
        print("WARNING: not a TPU backend — pass --interpret for a CPU "
              "plumbing smoke (real-Mosaic failures need the chip).")

    rng = np.random.default_rng(0)
    ok = True

    # ---- 1. voting kernel ------------------------------------------------
    m, h, p = 16, 512, 1024
    hyps = rng.uniform(0, 64, size=(m, h, 2)).astype(np.float32)
    pts = rng.uniform(0, 64, size=(m, p, 2)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, size=(m, p))
    dirs = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
    pv = (rng.random((m, p)) > 0.2).astype(np.float32)

    # Exercise the scalar-prefetch block-skip path too: slots >= 12 inactive.
    active = np.arange(m) < 12
    pv = pv * active[:, None]
    counts_k = np.asarray(
        jax.jit(
            lambda *a: vote_counts_pallas(
                *a, 0.999, interpret=interpret, active=jnp.asarray(active)
            )
        )(hyps, pts, dirs, pv)
    )
    counts_r = np.asarray(
        jax.jit(lambda *a: vote_counts_jnp(*a, 0.999))(hyps, pts, dirs, pv)
    )
    diff = int(np.sum(counts_k != counts_r))
    tol_diff = np.abs(counts_k - counts_r).max()
    # 0/1 sums are exact in f32 up to 2^24; allow <=1 vote of boundary
    # disagreement per (instance, hypothesis) from fused-multiply rounding.
    if tol_diff > 1.0:
        print(f"FAIL vote_counts: {diff} cells differ, max |d|={tol_diff}")
        ok = False
    else:
        print(f"PASS vote_counts ({m}x{h}x{p}): max |d|={tol_diff} "
              f"({diff} boundary cells)")

    # ---- 2. connected components ------------------------------------------
    b, hh, ww = 2, 480, 640
    fg = np.zeros((b, hh, ww), bool)
    for bi in range(b):
        for _ in range(6):  # random rectangles, some touching
            y, x = rng.integers(0, hh - 60), rng.integers(0, ww - 80)
            fg[bi, y:y + int(rng.integers(20, 60)),
               x:x + int(rng.integers(20, 80))] = True
    fg_j = jnp.asarray(fg)
    lab_k = np.asarray(
        jax.jit(
            lambda m: label_components(m, use_pallas=True,
                                       interpret=interpret)
        )(fg_j)
    )
    lab_r = np.asarray(
        jax.jit(lambda m: label_components(m, use_pallas=False))(fg_j)
    )
    for bi in range(b):
        ck, cr = canonical(lab_k[bi]), canonical(lab_r[bi])
        if not np.array_equal(ck, cr):
            n_bad = int(np.sum(ck != cr))
            print(f"FAIL connected_components image {bi}: "
                  f"{n_bad} px partition mismatch")
            ok = False
        else:
            n_comp = int(ck.max()) + 1
            print(f"PASS connected_components image {bi}: "
                  f"{n_comp} components, partitions identical")

    # ---- 3-5. soft voting / VP kernels / dense LSQ refinement -------------
    # Device results here; references from a clean-env CPU subprocess
    # (same seeded inputs, same threefry key -> identical traced programs).
    if interpret:
        print("note: checks 3-5 below compare CPU vs CPU under "
              "--interpret — plumbing smoke only, not device parity.")
    dev = compute_extended()
    ref_file = tempfile.mktemp(suffix=".npz", prefix="chip_check_ref_")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    r = subprocess.run(
        [sys.executable, __file__, "--emit-ref", ref_file],
        env=env, capture_output=True, text=True,
    )
    if r.returncode != 0:
        print(f"FAIL cpu reference subprocess:\n{r.stderr[-2000:]}")
        ok = False
    else:
        ref = dict(np.load(ref_file))
        os.unlink(ref_file)
        # Tolerances: these paths are f32 with HIGHEST-precision matmuls
        # where it matters; allow small cross-backend drift, fail loudly on
        # the catastrophic lowering bugs this script exists to catch.
        specs = [
            ("soft_z-score_centers", 0.1, "px"),
            ("soft_z-score_pruned", 0.1, "px"),
            ("soft_iqr_centers", 0.1, "px"),
            ("soft_iqr_pruned", 0.1, "px"),
            ("vp_best", 1e-3, "unit"),
            ("vp_counts", 2.0, "votes"),
            ("dense_refined", 0.25, "px"),
        ]
        for name, atol, unit in specs:
            d = np.abs(dev[name] - ref[name]).max()
            line = f"{name}: max |device-cpu| = {d:.2e} {unit} (atol {atol})"
            if d > atol or not np.all(np.isfinite(dev[name])):
                print(f"FAIL {line}")
                ok = False
            else:
                print(f"PASS {line}")

    print("chip_check:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--emit-ref" in sys.argv:
        out_path = sys.argv[sys.argv.index("--emit-ref") + 1]
        np.savez(out_path, **compute_extended())
        sys.exit(0)
    sys.exit(main())
