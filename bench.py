"""Headline benchmark: ViT-B 256x192 pose crops/sec/chip, end-to-end.

Measures the fused pose step (on-device crop sampling from a 1080p frame +
ViT-B forward + deconv head + UDP decode + un-crop) with a full 64-person
slot batch — the serving configuration.  Default dtype is size-aware:
int8 (W8A8 quantized blocks, models/quant.py) at ViT-B/L/H — the shipping
serving config, AP-gated within the 0.3-point parity envelope of bf16 by
the memorized-model COCO proxy (scripts/validate_e2e.py;
docs/QUANTIZATION.md has the numbers) — and bf16 at ViT-S, where int8 is
a measured null (1.00x, PERF.md) and would carry quantization risk for
zero gain.
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "crops/sec/chip", "vs_baseline": N}

Baseline: BASELINE.json north star = 500 crops/sec/chip (TPU v5e).
Usage: python bench.py [--slots 64] [--frames 40] [--size b]
                       [--dtype int8|bf16|fp32]

Timing method: n dependent frame steps (each step's keypoints feed, with
zero weight, into the next step's boxes) and a single final scalar fetch.
This forces the whole chain to execute before the clock stops —
block_until_ready can return early through the axon tunnel, per-step fetches
would pay ~27 ms RTT each, and wrapping the chain in lax.scan wedges the
remote-compile service at this program size.

The chain repeats ``--reps`` times and the BEST rep is reported (timeit-
style min-noise): tunnel throughput drifts 2-3x between minutes and a
single mid-chain stall once under-read a quiet-session 3300 crops/s by
25x — the best rep measures the chip, not the tunnel weather (on a
direct-attached host the reps agree within ~2%).
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=64,
                    help="person crops per frame step")
    ap.add_argument("--frames", type=int, default=40, help="timed frame steps")
    ap.add_argument("--reps", type=int, default=5,
                    help="timed repetitions; the best is reported")
    ap.add_argument("--size", default="b", choices=["s", "b", "l", "h"])
    ap.add_argument("--dtype", default="auto",
                    choices=["auto", "int8", "bf16", "fp32"],
                    help="int8 = W8A8 quantized serving (AP-gated vs bf16). "
                         "auto = int8 at b/l/h, bf16 at s: int8 is a "
                         "measured null at ViT-S (1.00x, PERF.md), so the "
                         "default doesn't carry quantization for zero gain")
    ap.add_argument("--fp32", action="store_true",
                    help="alias for --dtype fp32")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    import jax

    # the axon tunnel sporadically drops into UNAVAILABLE for minutes
    # (ROADMAP.md environment notes); bounded retries keep the driver's
    # end-of-round bench alive through a transient outage
    for attempt in range(5):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if attempt == 4:
                raise
            print(f"# backend unavailable (attempt {attempt + 1}/5), "
                  f"retrying in 120s: {e}", flush=True)
            try:  # drop the cached init failure so the retry is real
                import jax.extend.backend as _jeb
                _jeb.clear_backends()
            except Exception:
                pass
            time.sleep(120)

    import jax.numpy as jnp
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import (cast_params,
                                                 init_vitpose_params)
    from easy_vitpose_tpu.pipeline.pose_step import (default_block_impl,
                                                     pose_step_jit)

    if args.fp32:
        args.dtype = "fp32"
    if args.dtype == "auto":
        args.dtype = "bf16" if args.size == "s" else "int8"
    cfg = get_model_config("coco", args.size)
    quant = args.dtype == "int8"
    dtype = jnp.float32 if args.dtype == "fp32" else jnp.bfloat16
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    if quant:
        from easy_vitpose_tpu.models.quant import quantize_vit_params
        params = quantize_vit_params(params, jnp.bfloat16)
    elif dtype == jnp.bfloat16:
        params = cast_params(params, dtype)

    H, W, M = args.height, args.width, args.slots
    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.integers(0, 255, (H, W, 3), np.uint8))
              for _ in range(2)]
    boxes = jnp.asarray(np.stack([
        rng.uniform(0, W - 400, M), rng.uniform(0, H - 600, M),
        rng.uniform(400, W, M), rng.uniform(600, H, M)], -1)
        .astype(np.float32))
    mask = jnp.ones((M,), bool)

    block_impl = default_block_impl(compute_dtype=dtype)
    if quant:
        block_impl = ("pallas_q8" if block_impl == "pallas" else "xla_q8")

    def chain(n):
        b = boxes
        out = None
        for i in range(n):
            out = pose_step_jit(params, frames[i % len(frames)], b, mask,
                                cfg, compute_dtype=dtype,
                                sampler="matmul" if dtype == jnp.bfloat16
                                else "gather", block_impl=block_impl)
            b = boxes + 0.0 * out[0, 0, 0]
        return float(out[0, 0, 0])  # single fetch = hard sync

    chain(3)  # compile + warmup

    dt = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        chain(args.frames)
        dt = min(dt, time.perf_counter() - t0)

    crops_per_sec = args.frames * M / dt
    dtype_tag = ("int8 W8A8, AP-gated vs bf16" if quant else args.dtype)
    result = {
        "metric": f"vitpose-{args.size} 256x192 e2e pose crops/sec/chip "
                  f"(fused crop+forward+decode, {dtype_tag}, "
                  f"{M} crops/frame, {W}x{H} frame)",
        "value": round(crops_per_sec, 2),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / 500.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
