"""easy_vitpose_tpu: TPU-native 2D human & animal pose estimation.

A brand-new JAX/XLA/Pallas framework with the full capability surface of
JunkyByte/easy_ViTPose (detection -> tracking -> ViTPose -> UDP decode),
designed TPU-first.  Public API mirrors the reference's single public symbol
(reference easy_ViTPose/__init__.py:1-5).
"""
from .version import __version__

__all__ = ["VitInference", "__version__"]


def __getattr__(name):
    # lazy import: keep `import easy_vitpose_tpu` light for tooling
    if name == "VitInference":
        from .pipeline.inference import VitInference
        return VitInference
    raise AttributeError(name)
