"""The fused per-frame pose step: boxes -> keypoints in ONE jitted program.

This is the TPU-first replacement for the reference's per-person host loop
(easy_ViTPose/inference.py:259-272, which crops/pads/resizes/uploads/downloads
once per person).  Here a fixed batch of person slots is processed entirely
on-device:

  frame (H, W, 3) uint8 + boxes (M, 4) + mask (M,)
    -> crop_geometry / sample_crops / normalize   (ops/preprocess.py)
    -> ViTPose forward (models/)                   -> (M, K, 64, 48)
    -> UDP decode (ops/decode.py)                  -> (M, K, 2) + scores
    -> un-crop to frame coords
    -> (M, K, 3) keypoints as (y, x, score) — the reference's output layout
       (easy_ViTPose/inference.py:205, :270).

Person count is padded to a static slot count M (bucketed by the caller) so
XLA compiles once per (frame shape, M) pair; masked slots compute garbage
that is zeroed at the end — branchless, recompile-free.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import IMAGE_SIZE, ModelConfig
from ..models.vitpose import vitpose_forward
from ..ops import decode
from ..ops.preprocess import (crop_geometry, normalize_crops, sample_crops,
                              sample_crops_matmul, sample_crops_matmul_q8)


def pose_step(params, frame: jnp.ndarray, boxes: jnp.ndarray,
              mask: jnp.ndarray, cfg: ModelConfig,
              *, compute_dtype=jnp.float32, modulate_kernel: int = 11,
              y_bounds=None, flip_pairs=None, attn_impl: str = "einsum",
              unroll: bool = False, sampler: str = "gather",
              block_impl: str = "xla",
              frame_idx: jnp.ndarray = None) -> jnp.ndarray:
    """Run pose estimation for up to M people on one frame.

    Args:
      params: ViTPose params pytree (cast to ``compute_dtype`` by the caller
        for bf16 serving).
      frame: (H, W, 3) uint8 RGB frame (device array) — or a STACK
        (S, H, W, 3) with ``frame_idx`` mapping each slot to its frame
        (multi-stream / batched-window serving; boxes stay frame-local).
      boxes: (M, 4) float32 [x1, y1, x2, y2] detector/tracker boxes.
      mask: (M,) bool; False slots are padding.
      cfg: model config.

    Returns:
      (M, K, 3) float32 keypoints as (y, x, score) in frame coordinates;
      masked slots are all-zero.
    """
    geo = crop_geometry(boxes, frame.shape[-3:-1], y_bounds=y_bounds)
    # bf16 serving samples crops in bf16 too (error <= the reference's own
    # uint8 resize quantization; halves the sampler's HBM traffic).
    # sampler='matmul' rides the MXU instead of gathers (~26% faster);
    # 'pallas'/'pallas_interpret' is the window-streamed kernel
    # (ops/pallas_sampler.py) that skips out-of-span frame rows.
    if frame_idx is not None:
        # stacked-frame mode: only the gather sampler keeps intermediates at
        # single-frame scale (each crop gathers from its own frame)
        crops = sample_crops(frame, geo, IMAGE_SIZE,
                             sample_dtype=compute_dtype, frame_idx=frame_idx)
    elif sampler in ("pallas", "pallas_interpret"):
        from ..ops.pallas_sampler import sample_crops_pallas
        crops = sample_crops_pallas(frame, geo, IMAGE_SIZE,
                                    sample_dtype=compute_dtype,
                                    interpret=(sampler == "pallas_interpret"))
    else:
        sample_fn = {"matmul": sample_crops_matmul,
                     "matmul_q8": sample_crops_matmul_q8,
                     "gather": sample_crops}[sampler]
        crops = sample_fn(frame, geo, IMAGE_SIZE, sample_dtype=compute_dtype)
    x = normalize_crops(crops, dtype=compute_dtype)
    heatmaps = vitpose_forward(params, x, cfg, attn_impl=attn_impl,
                               unroll=unroll,
                               block_impl=block_impl).astype(jnp.float32)
    if flip_pairs is not None:
        # flip-test averaging (the reference configs declare flip_test=True
        # but its inference never wires it; mmpose semantics: forward the
        # horizontally flipped crop, un-flip the heatmaps, average)
        from ..ops.affine import flip_back_heatmaps
        hm_f = vitpose_forward(params, x[:, :, ::-1, :], cfg,
                               attn_impl=attn_impl, unroll=unroll,
                               block_impl=block_impl).astype(jnp.float32)
        heatmaps = 0.5 * (heatmaps + flip_back_heatmaps(hm_f, flip_pairs))

    # decode with the padded-crop center/scale, exactly like
    # VitInference.postprocess (easy_ViTPose/inference.py:200-204):
    # center = (w//2, h//2), scale = (w, h) of the padded crop.
    center = jnp.stack([geo["wp"] // 2, geo["hp"] // 2], axis=-1).astype(jnp.float32)
    scale = jnp.stack([geo["wp"], geo["hp"]], axis=-1).astype(jnp.float32)
    preds, maxvals = decode.keypoints_from_heatmaps_udp(
        heatmaps, center, scale, kernel=modulate_kernel)

    # un-crop: x += x1 - left ; y += y1 - top  (inference.py:270)
    off_x = (geo["x1"] - geo["left"]).astype(jnp.float32)
    off_y = (geo["y1"] - geo["top"]).astype(jnp.float32)
    xk = preds[..., 0] + off_x[:, None]
    yk = preds[..., 1] + off_y[:, None]
    kpts = jnp.stack([yk, xk, maxvals[..., 0]], axis=-1)
    return kpts * mask[:, None, None].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype",
                                             "modulate_kernel", "flip_pairs",
                                             "attn_impl", "unroll", "sampler",
                                             "block_impl"))
def pose_step_jit(params, frame, boxes, mask, cfg: ModelConfig,
                  compute_dtype=jnp.float32, modulate_kernel: int = 11,
                  flip_pairs=None, attn_impl: str = "einsum",
                  unroll: bool = False, sampler: str = "gather",
                  block_impl: str = "xla"):
    return pose_step(params, frame, boxes, mask, cfg,
                     compute_dtype=compute_dtype,
                     modulate_kernel=modulate_kernel,
                     flip_pairs=flip_pairs, attn_impl=attn_impl,
                     unroll=unroll, sampler=sampler, block_impl=block_impl)


def default_block_impl(device=None, compute_dtype=jnp.bfloat16) -> str:
    """Serving default for the transformer-block implementation: the fused
    Pallas kernel for bf16 serving on TPU (A/B: ViT-B/64 27.2 -> 21.9
    ms/frame, PERF.md); plain XLA elsewhere — Mosaic kernels don't compile
    on CPU, and fp32 is the bit-parity/debug mode whose exact-erf GELU the
    in-kernel A&S approximation (~5e-7/layer) would quietly diverge from."""
    import jax
    platform = device.platform if device is not None else jax.default_backend()
    return "pallas" if (platform == "tpu"
                        and compute_dtype == jnp.bfloat16) else "xla"


def bucket_slots(n: int, min_slots: int = 1, max_slots: int = 64) -> int:
    """Static person-slot count for n detections: next power of two, so the
    number of distinct compiled programs stays logarithmic."""
    m = min_slots
    while m < n:
        m *= 2
    return min(m, max_slots)
