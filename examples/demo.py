"""Minimal library-usage demo (the reference's colab_demo.ipynb role).

Runs the full pipeline on a synthetic image with randomly initialized
weights, so it works without downloading checkpoints; swap the init for
converted checkpoints (cli/convert) for real predictions.
"""
import numpy as np


def main():
    import jax
    try:  # degrade to CPU when no accelerator backend is usable
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
    from easy_vitpose_tpu import VitInference
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    # --- stand-in checkpoint (replace with a converted real one) ---
    cfg = get_model_config("coco", "s")
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    save_params("/tmp/vitpose-s-coco.npz", params)

    model = VitInference("/tmp/vitpose-s-coco.npz", model_name="s",
                         dataset="coco", is_video=False)

    img = np.random.default_rng(0).integers(
        0, 255, (480, 640, 3), np.uint8)
    boxes = np.array([[100, 80, 300, 420, 0.98],
                      [350, 120, 520, 460, 0.91]], np.float32)
    keypoints = model.inference(img, bboxes=boxes)
    for pid, k in keypoints.items():
        print(f"person {pid}: {k.shape[0]} keypoints, "
              f"mean score {k[:, 2].mean():.3f}")
    rendered = model.draw(show_yolo=True, confidence_threshold=-1)
    print("rendered image:", rendered.shape, rendered.dtype)

    # --- video-mode extras: tracking + One-Euro smoothing + batched ---
    vid = VitInference("/tmp/vitpose-s-coco.npz", model_name="s",
                       dataset="coco", is_video=True, smooth=True)
    clip = [img] * 4  # stand-in for consecutive frames
    outs = vid.inference_batched(clip, bboxes_per_frame=[boxes] * 4)
    print(f"batched video: {len(outs)} frames, "
          f"tracks {sorted(outs[-1])} (smoothed)")
    vid.reset()


if __name__ == "__main__":
    main()
