"""Model summary CLI: parameter counts + XLA cost-model FLOPs.

    python -m mydetection_tpu.summary yolov3 [--input-size 416]

Prints per-subtree parameter counts and the compiled forward graph's
FLOPs/image (utils/flops.py) — the numbers the README perf table's
MFU figures divide by. Handy when checking an imported checkpoint or
a config override reproduces the reference geometry.
"""

from __future__ import annotations

import argparse


def summarize(name: str, *, input_size: int | None = None,
              batch: int = 1) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mydetection_tpu.registry import get_model
    from mydetection_tpu.utils.flops import compiled_flops

    overrides = {"compute_dtype": jnp.float32}
    if input_size:
        overrides["input_size"] = input_size
    model = get_model(name, **overrides)
    cfg = model.config
    params = model.init(jax.random.PRNGKey(0))

    def count(tree) -> int:
        return int(sum(np.prod(np.shape(leaf))
                       for leaf in jax.tree_util.tree_leaves(tree)))

    per_tree = {k: count(v) for k, v in params.items()}
    total = sum(per_tree.values())

    def fwd(p, x):
        dense, _ = model.forward_dense(p, x)
        return sum(jnp.sum(v) for v in dense.values()
                   if hasattr(v, "dtype") and v.dtype != bool)

    x = jnp.zeros((batch, cfg.input_size, cfg.input_size, 3), jnp.uint8)
    fl = compiled_flops(fwd, params, x)
    return {
        "model": cfg.name,
        "input_size": cfg.input_size,
        "num_classes": cfg.num_classes,
        "params": total,
        "params_by_module": per_tree,
        "gflops_per_image": round(fl / batch / 1e9, 2) if fl else None,
    }


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", nargs="?", default="yolov3")
    ap.add_argument("--input-size", type=int, default=None)
    args = ap.parse_args(argv)

    info = summarize(args.model, input_size=args.input_size)
    print(f"{info['model']} @ {info['input_size']}  "
          f"(classes={info['num_classes']})")
    for k, v in sorted(info["params_by_module"].items()):
        print(f"  {k:>10}: {v / 1e6:8.2f} M params")
    print(f"  {'total':>10}: {info['params'] / 1e6:8.2f} M params")
    if info["gflops_per_image"] is not None:
        print(f"  forward: {info['gflops_per_image']:.2f} GFLOPs/image "
              f"(XLA cost model, dense decode incl.)")


if __name__ == "__main__":
    main()
