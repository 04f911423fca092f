"""Native checkpoint format: params pytree <-> flat .npz.

The torch converter (convert/vitpose_torch.py) is the entry for reference
.pth checkpoints; this module is the framework's own format (and the export
target of cli/convert).  Keys are '/'-joined tree paths.  Orbax is used for
training state (train/loop.py); .npz is the light serving format.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def flatten_params(params) -> Dict[str, np.ndarray]:
    flat = {}

    def visit(path, x):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(x)

    jax.tree_util.tree_map_with_path(visit, params)
    return flat


def save_params(path: str, params) -> None:
    np.savez_compressed(path, **flatten_params(params))


def load_params(path: str) -> Any:
    """Rebuild the nested dict/list pytree from a flat npz."""
    z = np.load(path)
    root: Dict[str, Any] = {}
    for key in z.files:
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = z[key]
    return _listify(root)


def _listify(node, path=()):
    """Convert {'0': ..., '1': ...} dicts (from list indices) back to lists —
    only for contiguous 0..n-1 index sets, and never for the YOLO 'model'
    layer table whose keys are layer numbers with gaps (0..22 minus pass-
    through layers)."""
    if not isinstance(node, dict):
        return node
    out = {k: _listify(v, path + (k,)) for k, v in node.items()}
    is_model_table = path and path[-1] == "model"
    if (out and not is_model_table
            and set(out) == {str(i) for i in range(len(out))}):
        return [out[str(i)] for i in range(len(out))]
    return out
