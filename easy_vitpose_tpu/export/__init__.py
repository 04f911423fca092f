"""Export backends.

* ``onnx_vitpose`` — a real ``.onnx`` artifact for non-torch/non-JAX runtime
  consumers (the reference's ``torch.onnx.export`` path, reference
  export.py:50-60), written by an in-repo dependency-free protobuf
  serializer (``onnx_proto``) and validated by an independent numpy ONNX
  interpreter (``onnx_ref``).
* The AOT XLA-executable path lives in ``cli/export.py`` (jax.export).
"""
from .onnx_vitpose import vitpose_to_onnx  # noqa: F401
