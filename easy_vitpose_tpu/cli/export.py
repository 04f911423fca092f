"""AOT export CLI — the TPU-native replacement for the reference's ONNX /
TensorRT export path (reference export.py:30-97).

Instead of a foreign-runtime artifact, the deployable unit here is:
  * a native .npz weight file (convert CLI), plus
  * an ahead-of-time compiled XLA executable for a fixed serving shape,
    produced with jax.jit(...).lower(...).compile() and serialized via
    jax.export when available.

Usage:
  python -m easy_vitpose_tpu.cli.export --model vitpose-b-coco.npz \
      --model-name b --batch 64 --out vitpose-b-coco.aot
"""
from __future__ import annotations

import argparse
import functools



def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help=".npz or .pth checkpoint")
    p.add_argument("--model-name", required=True, choices=["s", "b", "l", "h"])
    p.add_argument("--dataset", default=None)
    p.add_argument("--batch", type=int, default=64,
                   help="crop batch size to specialize for")
    p.add_argument("--dtype", default="bf16",
                   choices=["bf16", "fp32", "int8"])
    p.add_argument("--out", required=True, help="output .aot path")
    args = p.parse_args(argv)

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
