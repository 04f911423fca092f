"""easy_vitpose_tpu: TPU-native 2D human & animal pose estimation.

A brand-new JAX/XLA/Pallas framework with the full capability surface of
JunkyByte/easy_ViTPose (detection -> tracking -> ViTPose -> UDP decode),
designed TPU-first.  Public API mirrors the reference's single public symbol
(reference easy_ViTPose/__init__.py:1-5).
"""
import os as _os

from .version import __version__

__all__ = ["VitInference", "__version__"]

if _os.environ.get("EVT_FORCE_CPU"):
    # The JAX_PLATFORMS env var is ignored when a TPU plugin (e.g. axon) is
    # installed, so offer a knob that works: set EVT_FORCE_CPU=1 before
    # importing this package (or any CLI) to pin the CPU backend.
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")


def __getattr__(name):
    # lazy import: keep `import easy_vitpose_tpu` light for tooling
    if name == "VitInference":
        from .pipeline.inference import VitInference
        return VitInference
    raise AttributeError(name)
