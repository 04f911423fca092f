"""Checkpoint conversion CLI (replaces the reference's export.py front half +
model download story): torch .pth -> native .npz, ultralytics .pt -> .npz.

Usage:
  python -m easy_vitpose_tpu.cli.convert vitpose --ckpt vitpose-b-coco.pth \
      --model-name b --out vitpose-b-coco.npz
  python -m easy_vitpose_tpu.cli.convert yolo --ckpt yolov8n.pt --out yolov8n.npz
  python -m easy_vitpose_tpu.cli.convert to-torch --ckpt vitpose-b-coco.npz \
      --model-name b --out vitpose-b-coco.pth   # inverse: deploy back to torch
"""
from __future__ import annotations

import argparse

from ..configs import get_model_config, infer_dataset_by_path


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("vitpose")
    pv.add_argument("--ckpt", required=True)
    pv.add_argument("--model-name", required=True, choices=["s", "b", "l", "h"])
    pv.add_argument("--dataset", default=None)
    pv.add_argument("--out", required=True)

    py = sub.add_parser("yolo")
    py.add_argument("--ckpt", required=True)
    py.add_argument("--out", required=True)

    pp = sub.add_parser("plus", help="convert a ViTPose+ MoE checkpoint to "
                        "ONE live multi-task .npz (all experts + heads; "
                        "serve any task via models/moe.py — beyond the "
                        "reference, which can only split)")
    pp.add_argument("--ckpt", required=True)
    pp.add_argument("--model-name", default="b", choices=["s", "b", "l", "h"])
    pp.add_argument("--out", required=True)

    pt = sub.add_parser("to-torch", help="inverse conversion: native .npz -> "
                        "reference-format torch .pth (deploy a TPU-finetuned "
                        "checkpoint back into the torch/ONNX/TRT ecosystem)")
    pt.add_argument("--ckpt", required=True, help="native .npz checkpoint")
    pt.add_argument("--model-name", required=True, choices=["s", "b", "l", "h"])
    pt.add_argument("--dataset", default=None)
    pt.add_argument("--out", required=True, help="output .pth path")

    pa = sub.add_parser("average", help="uniform weight averaging (model "
                        "soup) of N same-shape .npz checkpoints — e.g. the "
                        "top-k epoch snapshots of one run")
    pa.add_argument("--ckpts", nargs="+", required=True)
    pa.add_argument("--out", required=True)

    ps = sub.add_parser("split", help="split a ViTPose+ MoE checkpoint into "
                        "per-dataset single-head .npz checkpoints "
                        "(reference model_split.py equivalent)")
    ps.add_argument("--source", required=True)
    ps.add_argument("--target", required=True, help="output directory")
    ps.add_argument("--prefix", default="vitpose-")
    ps.add_argument("--model-name", default="b", choices=["s", "b", "l", "h"])

    args = p.parse_args(argv)
    if args.cmd == "to-torch":
        from ..convert.vitpose_torch import save_torch_checkpoint
        from ..utils.checkpoint import load_params
        dataset = args.dataset or infer_dataset_by_path(args.ckpt)
        params = load_params(args.ckpt)
        k = None
        try:  # head width may differ from the dataset default (K-mismatch finetunes)
            k = int(params["head"]["final_b"].shape[0])
        except Exception:
            pass
        cfg = get_model_config(dataset, args.model_name, num_keypoints=k)
        save_torch_checkpoint(params, cfg, args.out)
        print(f"wrote {args.out} (reference-format torch state dict, "
              f"{dataset}, {args.model_name})")
        return
    if args.cmd == "average":
        import jax
        import numpy as np

        from ..utils.checkpoint import load_params, save_params
        trees = [load_params(c) for c in args.ckpts]
        ref_struct = jax.tree_util.tree_structure(trees[0])
        ref_shapes = [np.asarray(l).shape
                      for l in jax.tree_util.tree_leaves(trees[0])]
        for c, t in zip(args.ckpts[1:], trees[1:]):
            if jax.tree_util.tree_structure(t) != ref_struct or                     [np.asarray(l).shape
                     for l in jax.tree_util.tree_leaves(t)] != ref_shapes:
                raise SystemExit(f"{c}: checkpoint structure differs from "
                                 f"{args.ckpts[0]}")
        n = len(trees)
        def avg_leaf(*leaves):
            a0 = np.asarray(leaves[0])
            if not np.issubdtype(a0.dtype, np.floating):
                return a0  # int buffers (e.g. step counters) keep the first
            acc = sum(np.asarray(l, np.float64) for l in leaves) / n
            return acc.astype(a0.dtype)

        avg = jax.tree.map(avg_leaf, *trees)
        save_params(args.out, avg)
        print(f"wrote {args.out} (uniform average of {n} checkpoints)")
        return
    if args.cmd == "plus":
        import torch
        from ..convert.vitpose_plus import convert_vitpose_plus_state_dict
        from ..utils.checkpoint import save_params
        ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=True)
        cfg = get_model_config("coco", args.model_name)
        params = convert_vitpose_plus_state_dict(ckpt, cfg)
        save_params(args.out, params)
        print(f"wrote {args.out} (live multi-task: "
              f"{', '.join(sorted(params['heads']))})")
        return
    if args.cmd == "split":
        from ..convert.model_split import split_checkpoint_file
        paths = split_checkpoint_file(args.source, args.target,
                                      prefix=args.prefix,
                                      size=args.model_name)
        for ds, path in paths.items():
            print(f"wrote {path}")
        return
    if args.cmd == "vitpose":
        from ..convert.vitpose_torch import load_torch_checkpoint
        from ..utils.checkpoint import save_params
        dataset = args.dataset or infer_dataset_by_path(args.ckpt)
        cfg = get_model_config(dataset, args.model_name)
        params = load_torch_checkpoint(args.ckpt, cfg)
        save_params(args.out, params)
        print(f"wrote {args.out} ({dataset}, {args.model_name})")
    else:
        from ..convert.yolo_torch import (load_ultralytics_checkpoint,
                                          save_yolo_npz)
        params, scale, nc = load_ultralytics_checkpoint(args.ckpt)
        save_yolo_npz(args.out, params, scale, nc)
        print(f"wrote {args.out} (yolov8{scale}, nc={nc})")


if __name__ == "__main__":
    main()
