"""Checkpoint save/load for pytree params.

Reference parity: `torch.save({'model': state_dict, 'optimizer': …,
'iter': n})` to `weights/*.pt` [recalled; SURVEY.md §2.15 / §5.4].
Ours: params are nested-dict pytrees stored as flat `.npz`
(dependency-light, host-portable); training checkpoints bundle
params + optimizer state + step under reserved key prefixes.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

SEP = "/"
# bumped whenever saved-tree semantics change; load_checkpoint exposes it
# so callers can give migration hints on geometry-incompatible trees
FORMAT_VERSION = 2


def flatten_tree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    """Tree → flat {path: array}. Round-trip faithful: tuples and
    lists keep their container type (`#t<i>` / `#l<i>` path segments)
    and None leaves survive as a marker entry — silently dropping them
    would make a resumed optimizer state structurally different from
    the saved one (tree_map raises on the mismatch).

    Dict keys starting with '#' or equal to '__none__' are RESERVED for
    those markers and rejected loudly — a silent collision would make
    unflatten_tree rebuild the wrong container type.
    """
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        if not tree:
            raise ValueError(
                "flatten_tree: empty dict containers cannot round-trip "
                f"(at path {prefix!r}) — the flat form has no entry to "
                "rebuild them from, so a resumed tree would be "
                "structurally different; drop the empty container or "
                "use a None leaf")
        for k, v in tree.items():
            if k.startswith("#") or k == "__none__":
                raise ValueError(
                    f"dict key {k!r} collides with flatten_tree's "
                    "reserved markers ('#…' container indices, "
                    "'__none__' None leaves) — rename the key")
            if SEP in k:
                raise ValueError(
                    f"dict key {k!r} contains the path separator "
                    f"{SEP!r}: unflatten_tree would split it into "
                    "nested dicts (silent structure corruption, or an "
                    "error if the prefix also names a leaf) — rename "
                    "the key")
            out.update(flatten_tree(v, f"{prefix}{k}{SEP}"))
    elif isinstance(tree, (list, tuple)):
        if not tree:
            raise ValueError(
                "flatten_tree: empty list/tuple containers cannot "
                f"round-trip (at path {prefix!r}); drop the container "
                "or use a None leaf")
        tag = "#t" if isinstance(tree, tuple) else "#l"
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{tag}{i}{SEP}"))
    elif tree is None:
        out[prefix + "__none__"] = np.zeros(0, np.float32)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict[str, np.ndarray]) -> Any:
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def idx(key: str) -> int:
        return int(key.lstrip("#tl"))

    def rebuild(node):
        if not isinstance(node, dict):
            return jnp.asarray(node)
        if set(node) == {"__none__"}:
            return None
        if node and all(k.startswith("#") for k in node):
            items = sorted(node.items(), key=lambda kv: idx(kv[0]))
            seq = [rebuild(v) for _, v in items]
            # '#t' = tuple, '#l' or legacy bare '#<i>' = list
            if next(iter(node)).startswith("#t"):
                return tuple(seq)
            return seq
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(root)


def save_checkpoint(path: str, params: Any, *, step: int | None = None,
                    opt_state: Any = None, extra: dict | None = None) -> None:
    flat = {f"params{SEP}{k}": v for k, v in flatten_tree(params).items()}
    if opt_state is not None:
        flat.update({f"opt{SEP}{k}": v for k, v in flatten_tree(opt_state).items()})
    if step is not None:
        flat["__step__"] = np.asarray(step)
    flat["__format_version__"] = np.asarray(FORMAT_VERSION)
    for k, v in (extra or {}).items():
        flat[f"extra{SEP}{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:  # explicit handle: numpy won't append .npz
        np.savez(fh, **flat)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    """Returns {'params': tree, 'opt': tree|None, 'step': int|None,
    'extra': dict, 'format_version': int}.

    Legacy note: checkpoints written before the container markers
    (format_version < 2) stored sequence indices as bare '#<i>' path
    segments with no tuple/list tag; those always rebuild as LISTS. A
    pre-change optimizer state that contained tuples therefore resumes
    with a container-type mismatch (tree_map structure error) — rebuild
    such checkpoints by re-saving, or retrain from the params alone.
    """
    with np.load(path, allow_pickle=False) as zf:
        flat = {k: zf[k] for k in zf.files}
    params_flat = {k[len("params" + SEP):]: v for k, v in flat.items()
                   if k.startswith("params" + SEP)}
    opt_flat = {k[len("opt" + SEP):]: v for k, v in flat.items()
                if k.startswith("opt" + SEP)}
    extra = {k[len("extra" + SEP):]: v for k, v in flat.items()
             if k.startswith("extra" + SEP)}
    return {
        "params": unflatten_tree(params_flat) if params_flat else None,
        "opt": unflatten_tree(opt_flat) if opt_flat else None,
        "step": int(flat["__step__"]) if "__step__" in flat else None,
        "extra": extra,
        "format_version": (int(flat["__format_version__"])
                           if "__format_version__" in flat else 1),
    }


def load_params(path: str) -> Any:
    """Weights-only load (the Detector path, reference `load_state_dict`)."""
    ckpt = load_checkpoint(path)
    if ckpt["params"] is None:
        raise ValueError(f"checkpoint {path} has no params")
    return ckpt["params"]


def check_params_compatible(expected: Any, loaded: Any, *,
                            context: str = "") -> None:
    """Raise a readable error when a loaded param tree doesn't fit the
    model that will consume it.

    Model-geometry changes (e.g. the FPN P6 input moving 2048→256
    channels) silently orphan old checkpoints; without this check the
    mismatch surfaces as an opaque XLA shape error at first forward —
    or worse, decodes wrongly. `expected` may hold arrays or
    jax.eval_shape ShapeDtypeStructs (only .shape is compared).
    """
    exp_flat = {k: np.asarray(getattr(v, "shape", v))
                for k, v in _shape_paths(expected).items()}
    got_flat = {k: np.asarray(getattr(v, "shape", v))
                for k, v in _shape_paths(loaded).items()}
    missing = sorted(set(exp_flat) - set(got_flat))
    unexpected = sorted(set(got_flat) - set(exp_flat))
    mismatched = sorted(
        k for k in set(exp_flat) & set(got_flat)
        if tuple(exp_flat[k]) != tuple(got_flat[k]))
    if missing or unexpected or mismatched:
        lines = [f"checkpoint is incompatible with the model{context}:"]
        for k in mismatched[:8]:
            lines.append(f"  shape mismatch {k}: checkpoint "
                         f"{tuple(got_flat[k])} vs model {tuple(exp_flat[k])}")
        if missing:
            lines.append(f"  missing from checkpoint: {missing[:6]}")
        if unexpected:
            lines.append(f"  not in model: {unexpected[:6]}")
        lines.append(
            "  (likely a checkpoint saved before a model-geometry "
            "change — re-import the source weights or retrain; see "
            "load_checkpoint's format_version)")
        raise ValueError("\n".join(lines))


def _shape_paths(tree: Any, prefix: str = "") -> dict[str, Any]:
    """{path: leaf} over dict/list/tuple containers, shape-bearing leaves."""
    out: dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_shape_paths(v, f"{prefix}{k}{SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_shape_paths(v, f"{prefix}{i}{SEP}"))
    elif tree is not None:
        out[prefix[:-1]] = tree
    return out
