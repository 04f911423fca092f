"""Persistent XLA compilation cache.

The reference ships precompiled engines (ONNX / TensorRT files) so a
deployment never pays graph compilation twice; the TPU-native analog is
JAX's persistent compilation cache, which stores the serialized XLA
executable keyed on (HLO, compile options, backend version).  First
compile of the fused serving program costs 20-40 s — with the cache a
process restart reloads it in well under a second, which is the
difference between "rolling restart" and "outage" for a serving fleet.

Enabled automatically by ``VitInference`` and the train CLI.  Knobs:

* ``EVT_COMPILE_CACHE=<dir>`` — cache directory (default
  ``~/.cache/easy_vitpose_tpu/xla``), and an opt-in on non-TPU
  backends.
* ``EVT_COMPILE_CACHE=0`` — disable.

Auto-enable is TPU-only: XLA:CPU AOT reloads record compile-machine
CPU-feature lists and error-log (worst case SIGILL) when the executing
host differs — e.g. one ~/.cache shared across a heterogeneous CPU
fleet — so CPU/GPU processes only cache when the user names a directory
(explicit arg or the env var).  Measured wins: TPU restart first
dispatch 1.56 s -> 0.38 s; CPU VitInference restart 3.9 s -> 1.5 s.

Failure-tolerant: a read-only filesystem or an old jax version degrades
to a one-line warning, never an error (cache problems must not take
down serving).
"""
from __future__ import annotations

import os
import warnings

_ENABLED_DIR: str | None = None


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir`` and
    return the directory in effect (None if disabled or unavailable).

    Idempotent: later calls with a different directory keep the first
    one (the cache is process-global in JAX).
    """
    global _ENABLED_DIR
    if _ENABLED_DIR is not None:
        return _ENABLED_DIR

    env = os.environ.get("EVT_COMPILE_CACHE")
    if env == "0":
        return None
    path = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "easy_vitpose_tpu", "xla")
    try:
        import jax
        if cache_dir is None and not env \
                and jax.default_backend() != "tpu":
            # auto mode is TPU-only (see module docstring); name a
            # directory to cache CPU/GPU compiles anyway
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every compile that takes >=1s (the jax default) — the
        # serving/train programs all qualify, per-op CPU test trivia
        # doesn't, which keeps the cache dir small.
        _ENABLED_DIR = path
        return path
    except Exception as e:  # pragma: no cover - depends on fs/jax build
        warnings.warn(f"persistent compilation cache unavailable: {e}")
        return None
