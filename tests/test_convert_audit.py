"""Converter key-coverage audit: missing/unexpected checkpoint keys must be
a HARD error naming the keys (the reference loader only prints them,
reference vit_utils/util.py:160-171), closing the layout-drift risk of a
converter that indexes only expected keys."""
import numpy as np
import pytest

from easy_vitpose_tpu.convert.vitpose_torch import (audit_state_dict_keys,
                                                    convert_vitpose_state_dict,
                                                    expected_vitpose_keys)
from tests.test_model_parity import CASES, load_case


@pytest.fixture(scope="module")
def tiny_sd():
    sd, _, _ = load_case("tiny")
    return sd


def test_clean_checkpoint_passes_strict(tiny_sd):
    params = convert_vitpose_state_dict(tiny_sd, CASES["tiny"])
    assert "backbone" in params and "head" in params


def test_num_batches_tracked_buffer_is_tolerated(tiny_sd):
    sd = dict(tiny_sd)
    sd["keypoint_head.deconv_layers.1.num_batches_tracked"] = \
        np.asarray(7, np.int64)
    convert_vitpose_state_dict(sd, CASES["tiny"])


@pytest.mark.parametrize("spike", [
    "backbone.blocks.0.gamma_1",                    # layer-scale gamma
    "backbone.blocks.0.attn.q_bias",                # split q/v bias variant
    "backbone.blocks.0.attn.v_bias",
    "associate_keypoint_heads.0.final_layer.weight",  # extra task head
    "backbone.blocks.0.mlp.experts.0.weight",       # MoE expert FFN
])
def test_unexpected_key_is_hard_error_naming_it(tiny_sd, spike):
    sd = dict(tiny_sd)
    sd[spike] = np.zeros((4,), np.float32)
    with pytest.raises(ValueError, match="unexpected") as ei:
        convert_vitpose_state_dict(sd, CASES["tiny"])
    assert spike in str(ei.value)


def test_missing_key_is_hard_error_naming_it(tiny_sd):
    sd = dict(tiny_sd)
    del sd["keypoint_head.final_layer.bias"]
    del sd["backbone.blocks.1.norm2.weight"]
    with pytest.raises(ValueError, match="missing") as ei:
        convert_vitpose_state_dict(sd, CASES["tiny"])
    msg = str(ei.value)
    assert "keypoint_head.final_layer.bias" in msg
    assert "backbone.blocks.1.norm2.weight" in msg


def test_depth_mismatch_reports_both_sides(tiny_sd):
    """A checkpoint deeper than the config shows up as unexpected block
    keys; shallower as missing ones."""
    import dataclasses
    sd = dict(tiny_sd)
    deeper = dataclasses.replace(
        CASES["tiny"],
        backbone=dataclasses.replace(CASES["tiny"].backbone, depth=3))
    with pytest.raises(ValueError, match="missing"):
        convert_vitpose_state_dict(sd, deeper)


def test_strict_false_converts_anyway(tiny_sd):
    sd = dict(tiny_sd)
    sd["backbone.blocks.0.gamma_1"] = np.zeros((4,), np.float32)
    params = convert_vitpose_state_dict(sd, CASES["tiny"], strict=False)
    ref = convert_vitpose_state_dict(tiny_sd, CASES["tiny"])
    np.testing.assert_array_equal(params["head"]["final_w"],
                                  ref["head"]["final_w"])


def test_expected_keys_cover_exactly_what_conversion_reads(tiny_sd):
    req, opt = expected_vitpose_keys(CASES["tiny"])
    assert req == set(tiny_sd) - opt
    audit_state_dict_keys(tiny_sd, CASES["tiny"])   # no raise


# ---------------------------------------------------------------- YOLO side

def _yolo_sd_and_spec():
    torch = pytest.importorskip("torch")
    from easy_vitpose_tpu.detect import yolo as Y
    from tests.test_yolo_torch_parity import TYolo, _ultra_state_dict
    spec = Y.YoloSpec("n")
    torch.manual_seed(0)
    return _ultra_state_dict(TYolo(spec).eval()), spec


def test_yolo_clean_checkpoint_passes_strict():
    from easy_vitpose_tpu.convert.yolo_torch import convert_yolo_state_dict
    sd, spec = _yolo_sd_and_spec()
    sd["model.22.dfl.conv.weight"] = np.arange(16, dtype=np.float32)[
        None, :, None, None].transpose(1, 0, 2, 3)   # tolerated DFL buffer
    convert_yolo_state_dict(sd, spec)


def test_yolo_unexpected_key_is_hard_error():
    from easy_vitpose_tpu.convert.yolo_torch import convert_yolo_state_dict
    sd, spec = _yolo_sd_and_spec()
    sd["model.23.conv.weight"] = np.zeros((4, 4, 1, 1), np.float32)
    with pytest.raises(ValueError, match="model.23.conv.weight"):
        convert_yolo_state_dict(sd, spec)
    convert_yolo_state_dict(sd, spec, strict=False)   # tolerant escape


def test_yolo_missing_key_is_hard_error_naming_it():
    from easy_vitpose_tpu.convert.yolo_torch import convert_yolo_state_dict
    sd, spec = _yolo_sd_and_spec()
    del sd["model.22.cv3.2.2.bias"]
    with pytest.raises(KeyError, match="model.22.cv3.2.2.bias"):
        convert_yolo_state_dict(sd, spec)
