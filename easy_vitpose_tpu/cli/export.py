"""Export CLI — both export paths of the reference's export.py:30-97.

  * ``--format aot`` (default): the TPU-native deployable — an
    ahead-of-time compiled XLA executable for a fixed serving shape,
    produced with jax.jit(...).lower(...).compile() and serialized via
    jax.export (replaces the reference's TensorRT engine).
  * ``--format onnx``: a real ``.onnx`` artifact with a dynamic batch
    axis (the reference's torch.onnx.export twin, reference
    export.py:50-60), written by the in-repo dependency-free serializer
    (export/onnx_vitpose.py) for non-torch/non-JAX runtime consumers.

Usage:
  python -m easy_vitpose_tpu.cli.export --model vitpose-b-coco.npz \
      --model-name b --batch 64 --out vitpose-b-coco.aot
  python -m easy_vitpose_tpu.cli.export --model vitpose-b-coco.npz \
      --model-name b --format onnx --out vitpose-b-coco.onnx
"""
from __future__ import annotations

import argparse
import functools



def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help=".npz or .pth checkpoint")
    p.add_argument("--model-name", required=True, choices=["s", "b", "l", "h"])
    p.add_argument("--dataset", default=None)
    p.add_argument("--batch", type=int, default=None,
                   help="crop batch size to specialize for (aot only; "
                        "default 64 — onnx exports a dynamic batch axis)")
    p.add_argument("--dtype", default=None,
                   choices=["bf16", "fp32", "int8"],
                   help="aot artifact dtype (default bf16; onnx is always "
                        "f32 like the reference artifact)")
    p.add_argument("--format", default="aot", choices=["aot", "onnx"],
                   help="aot: serialized XLA executable (default); "
                        "onnx: .onnx with a dynamic batch axis "
                        "(f32, reference export.py:50-60 twin)")
    p.add_argument("--out", required=True, help="output artifact path")
    args = p.parse_args(argv)
    if args.format == "onnx":
        # don't silently write an f32 graph when the user asked for
        # int8/bf16 or a fixed batch — the onnx artifact is always f32
        # with a dynamic batch axis, like the reference's.
        if args.dtype not in (None, "fp32"):
            p.error(f"--format onnx always exports f32 (got --dtype "
                    f"{args.dtype}); ONNX quantization is not supported")
        if args.batch is not None:
            p.error("--format onnx exports a dynamic batch axis; "
                    "--batch only applies to --format aot")
    else:
        args.batch = 64 if args.batch is None else args.batch
        args.dtype = args.dtype or "bf16"

    import jax
    import jax.numpy as jnp
    from ..configs import get_model_config, infer_dataset_by_path
    from ..models.vitpose import cast_params, vitpose_forward

    dataset = args.dataset or infer_dataset_by_path(args.model)
    cfg = get_model_config(dataset, args.model_name)
    if args.model.endswith(".pth"):
        from ..convert.vitpose_torch import load_torch_checkpoint
        params = load_torch_checkpoint(args.model, cfg)
    else:
        from ..utils.checkpoint import load_params
        params = load_params(args.model)

    if args.format == "onnx":
        from ..export.onnx_vitpose import vitpose_to_onnx
        blob = vitpose_to_onnx(params, cfg)
        with open(args.out, "wb") as f:
            f.write(blob)
        print(f"wrote {args.out} ({len(blob)} bytes, onnx opset 17, "
              f"dynamic batch)")
        return

    quant = args.dtype == "int8"
    dtype = jnp.float32 if args.dtype == "fp32" else jnp.bfloat16
    params = jax.tree.map(jnp.asarray, params)
    if quant:
        # W8A8 export: int8 weights bake into the artifact; the int8 block
        # runs through the XLA twin so the exported HLO is backend-portable
        from ..models.quant import quantize_vit_params
        params = quantize_vit_params(params, dtype)
        fn = jax.jit(functools.partial(vitpose_forward, cfg=cfg,
                                       block_impl="xla_q8"))
    else:
        if dtype == jnp.bfloat16:
            params = cast_params(params, dtype)
        fn = jax.jit(functools.partial(vitpose_forward, cfg=cfg))
    x_spec = jax.ShapeDtypeStruct((args.batch, 256, 192, 3), dtype)
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)

    try:
        from jax import export as jax_export
        exported = jax_export.export(fn)(p_spec, x_spec)
        blob = exported.serialize()
        with open(args.out, "wb") as f:
            f.write(blob)
        print(f"wrote {args.out} ({len(blob)} bytes, "
              f"batch={args.batch}, {args.dtype})")
    except Exception as e:
        # fall back: persist lowered HLO text (still useful for inspection)
        lowered = fn.lower(p_spec, x_spec)
        with open(args.out, "w") as f:
            f.write(lowered.as_text())
        print(f"jax.export unavailable ({e}); wrote HLO text to {args.out}")


if __name__ == "__main__":
    main()
