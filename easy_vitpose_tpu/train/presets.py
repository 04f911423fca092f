"""Training presets — typed equivalents of the reference's
configs/train_configs/*.py recipes.

* ``from_scratch(size)``: 210-epoch AdamW layer-decay recipe
  (reference train_configs/ViTPose_base_coco_256x192.py:7-31 and the l/h
  variants; use ``make_adamw_layer_decay_optimizer``).
* ``finetune(size)``: the *_custom recipe — Adam 3.75e-4 +
  ReduceLROnPlateau, save_interval/early stop
  (reference train_configs/ViTPose_large_coco_256x192_custom.py:7-21).
* ``simple_head=True`` configs pair with HeadConfig(upsample=4, 3x3 final)
  via configs.get_model_config(..., simple_head=True)
  (reference train_configs/ViTPose_base_simple_coco_256x192.py:63-67).
"""
from __future__ import annotations

from .loop import TrainSettings

# layer-decay rates per size (reference train_configs: b 0.75, l 0.8, h 0.85
# in the upstream recipes; the reference repo pins 1-2e-4 in common.py which
# is the finetune-ish variant — we expose both)
LAYER_DECAY = {"s": 0.75, "b": 0.75, "l": 0.8, "h": 0.85}
DEPTHS = {"s": 12, "b": 12, "l": 24, "h": 32}


def finetune(size: str = "b", **overrides) -> TrainSettings:
    """The reference's custom finetune recipe (Adam + plateau scheduler)."""
    base = dict(lr=3.75e-4, total_epochs=210, batch_size=64, use_amp=True,
                lr_factor=0.1, lr_patience=4, save_interval=10,
                early_stop_patience=15)
    base.update(overrides)
    return TrainSettings(**base)


def from_scratch(size: str = "b", **overrides) -> TrainSettings:
    """210-epoch AdamW recipe settings; pair with
    make_adamw_layer_decay_optimizer(lr=1e-3, wd=0.1,
    layer_decay_rate=LAYER_DECAY[size], depth=DEPTHS[size])."""
    base = dict(lr=1e-3, total_epochs=210, batch_size=64, use_amp=True,
                save_interval=10, early_stop_patience=10 ** 9)
    base.update(overrides)
    return TrainSettings(**base)
