"""Import-compatibility shim: the reference package name, TPU-native engine.

The upstream project's entire public surface is one symbol imported as
``from easy_ViTPose import VitInference`` (reference easy_ViTPose/
__init__.py:1-5, README.md:126-153).  Installing this framework keeps that
exact import line working — it resolves to
:class:`easy_vitpose_tpu.pipeline.inference.VitInference`, whose
constructor arguments and ``inference``/``draw``/``reset``/``postprocess``
semantics match the reference contract (see tests/test_vitinference.py).

New code should import from :mod:`easy_vitpose_tpu` directly; this alias
exists so reference users can switch without touching their call sites.
"""
from easy_vitpose_tpu import VitInference, __version__

__all__ = ["VitInference", "__version__"]
