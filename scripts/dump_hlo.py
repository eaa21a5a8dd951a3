"""Dump optimized HLO for fast vs slow variants; summarize big/expensive ops."""

import collections
import re
import sys

import numpy as np


def summarize(hlo: str, name: str):
    # count ops by kind and find the largest shapes
    op_re = re.compile(r"^\s*(?:ROOT )?%?[\w.\-]+ = ([a-z0-9]+)\[([\d,]*)\]\S* (\w+)\(", re.M)
    sizes = []
    kinds = collections.Counter()
    for m in op_re.finditer(hlo):
        dtype, shape, kind = m.groups()
        dims = [int(x) for x in shape.split(",") if x]
        n = int(np.prod(dims)) if dims else 1
        kinds[kind] += 1
        sizes.append((n, kind, dtype, shape))
    sizes.sort(reverse=True)
    print(f"=== {name}: {sum(kinds.values())} ops")
    for n, kind, dtype, shape in sizes[:12]:
        print(f"  {n:>12,}  {kind:12s} {dtype}[{shape}]")
    interesting = {k: v for k, v in kinds.items() if k in (
        "transpose", "pad", "convert", "while", "sort", "gather", "scatter",
        "custom-call", "copy", "reshape", "dynamic-slice", "dynamic-update-slice",
    )}
    print(f"  kinds: {dict(kinds.most_common(10))}")
    print(f"  interesting: {interesting}")


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from fastposecnn_tpu import config as C
    from fastposecnn_tpu import constants, geometry
    from fastposecnn_tpu.models import PoseRegressorNet
    from fastposecnn_tpu.pipeline import run_pipeline

    rng = np.random.default_rng(0)
    hp = C.inference()
    net = PoseRegressorNet(num_classes=hp.num_classes, dtype=jnp.bfloat16)
    image = jnp.asarray(rng.normal(size=(1, 480, 640, 3)), jnp.float32)
    variables = net.init(jax.random.key(0), image[:, :64, :64])
    inv_K = jnp.asarray(np.linalg.inv(constants.INTRINSICS["CAMERA"]), jnp.float32)
    key = jax.random.key(1)
    pcfg = dataclasses.replace(
        C.pipeline_config_from(hp, use_pallas=True),
        perform_rt_calculation=False,
    )

    def base_agg(v, im, k):
        out = run_pipeline(net.apply(v, im, train=False), k, pcfg, inv_K)
        return out["aggregated"]

    def fast(v, im, k):
        a = base_agg(v, im, k)
        return a["class_ids"], a["xy"], a["z"], a["quaternion"]

    def slow(v, im, k):
        a = base_agg(v, im, k)
        return geometry.backproject_to_translation(
            a["xy"], a["z"][..., None], inv_K)

    for name, fn in (("fast", fast), ("slow", slow)):
        compiled = jax.jit(fn).lower(variables, image, key).compile()
        hlo = compiled.as_text()
        with open(f"/tmp/hlo_{name}.txt", "w") as f:
            f.write(hlo)
        summarize(hlo, name)
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            print(f"  cost: flops={ca.get('flops', 0):,.0f} "
                  f"bytes={ca.get('bytes accessed', 0):,.0f}")
        except Exception as e:
            print("  cost_analysis failed:", e)


if __name__ == "__main__":
    main()
