"""On-chip Pallas kernel parity check.

CI exercises the Pallas kernels only in interpret mode, which cannot catch
real-Mosaic restrictions (i1 vector concat, sublane divisibility, scoped
vmem limits — exactly the class of failure fixed in commit 8dff1de). This
script runs the two custom kernels on the REAL device and asserts they
match their jnp reference implementations:

  1. vote_counts_pallas vs vote_counts_jnp   (exact: 0/1 float sums)
  2. label_components_pallas vs the segmented-scan path
     (canonical-partition equality + raster-order label equivalence)

Run on the TPU host with no env overrides: `python scripts/chip_check.py`.
Exits 0 on pass, 1 on mismatch; prints one status line per check.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


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

    print("chip_check:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
