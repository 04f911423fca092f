"""Debug/sanitizer switches.

The reference has no sanitizers or race detection (SURVEY §5).  JAX's
functional model removes data races by construction; what remains useful:
NaN/Inf tracing, jit bypass for ad-hoc inspection, and numeric-diff helpers.
"""
from __future__ import annotations

import contextlib
from typing import Iterator


def enable_nan_checks(enable: bool = True) -> None:
    """Raise on any NaN produced inside jitted code (jax debug_nans)."""
    import jax
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def no_jit() -> Iterator[None]:
    """Run a block eagerly (op-by-op) for debugging."""
    import jax
    with jax.disable_jit():
        yield


def tree_compare(a, b, atol: float = 1e-5) -> dict:
    """Max abs diff per leaf path between two pytrees (for converter or
    resume debugging).  Returns {path: diff} for leaves above atol."""
    import jax
    import numpy as np
    out = {}

    def visit(path, x, y):
        d = float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        if d > atol:
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                           for p in path)
            out[key] = d
        return x

    jax.tree_util.tree_map_with_path(visit, a, b)
    return out
