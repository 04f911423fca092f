"""YOLOv8 numeric parity vs an independent torch implementation.

The converter's structure/BN-fold are tested elsewhere; this builds the same
architecture independently in torch (from the public YOLOv8 spec), loads the
SAME random weights through the ultralytics-format state dict, and demands
forward equality — guarding the block wiring (C2f split order, SPPF chain,
PAN concat order, detect-head branches) end to end.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easy_vitpose_tpu.convert import yolo_torch as CYT
from easy_vitpose_tpu.detect import yolo as Y

torch = pytest.importorskip("torch")
nn = torch.nn


class TConv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, (k - 1) // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(TBottleneck(self.c, shortcut)
                               for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.cv1 = TConv(c1, c1 // 2, 1)
        self.cv2 = TConv(c1 * 2, c2, 1)
        self.m = nn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TYolo(nn.Module):
    """YOLOv8 backbone+neck+detect with ultralytics module numbering."""

    def __init__(self, spec):
        super().__init__()
        w = spec.widths
        d = spec.depths
        c2h, c3h = Y.detect_head_channels(spec)
        layers = {
            "0": TConv(3, w[0], 3, 2), "1": TConv(w[0], w[1], 3, 2),
            "2": TC2f(w[1], w[1], d[0], True),
            "3": TConv(w[1], w[2], 3, 2),
            "4": TC2f(w[2], w[2], d[1], True),
            "5": TConv(w[2], w[3], 3, 2),
            "6": TC2f(w[3], w[3], d[1], True),
            "7": TConv(w[3], w[4], 3, 2),
            "8": TC2f(w[4], w[4], d[3], True),
            "9": TSPPF(w[4], w[4]),
            "12": TC2f(w[3] + w[4], w[3], d[3], False),
            "15": TC2f(w[2] + w[3], w[2], d[3], False),
            "16": TConv(w[2], w[2], 3, 2),
            "18": TC2f(w[2] + w[3], w[3], d[3], False),
            "19": TConv(w[3], w[3], 3, 2),
            "21": TC2f(w[3] + w[4], w[4], d[3], False),
        }
        self.model = nn.ModuleDict(layers)
        det = nn.Module()
        det.cv2 = nn.ModuleList(
            nn.Sequential(TConv(c, c2h, 3), TConv(c2h, c2h, 3),
                          nn.Conv2d(c2h, 4 * Y.REG_MAX, 1))
            for c in (w[2], w[3], w[4]))
        det.cv3 = nn.ModuleList(
            nn.Sequential(TConv(c, c3h, 3), TConv(c3h, c3h, 3),
                          nn.Conv2d(c3h, spec.nc, 1))
            for c in (w[2], w[3], w[4]))
        self.model["22"] = det
        self.up = nn.Upsample(scale_factor=2, mode="nearest")

    def forward(self, x):
        m = self.model
        y0 = m["0"](x); y1 = m["1"](y0); y2 = m["2"](y1)
        y3 = m["3"](y2); y4 = m["4"](y3)
        y5 = m["5"](y4); y6 = m["6"](y5)
        y7 = m["7"](y6); y8 = m["8"](y7); y9 = m["9"](y8)
        y12 = m["12"](torch.cat([self.up(y9), y6], 1))
        y15 = m["15"](torch.cat([self.up(y12), y4], 1))
        y16 = m["16"](y15)
        y18 = m["18"](torch.cat([y16, y12], 1))
        y19 = m["19"](y18)
        y21 = m["21"](torch.cat([y19, y9], 1))
        outs = []
        for li, feat in enumerate((y15, y18, y21)):
            outs.append(torch.cat([m["22"].cv2[li](feat),
                                   m["22"].cv3[li](feat)], 1))
        return outs


def _ultra_state_dict(model):
    """Rename the mini-clone's keys to the ultralytics layout our converter
    expects (model.{i}.conv.weight etc.)."""
    sd = {}
    for k, v in model.state_dict().items():
        if k.startswith("model."):
            k = k.replace("model.", "model.", 1)
        sd[k] = v.detach().numpy()
    # ModuleDict already yields model.0.conv.weight-style keys; detect head
    # Sequential indices are .0/.1/.2 like ultralytics.
    return sd


def test_yolo_forward_matches_torch_clone():
    spec = Y.YoloSpec("n")
    torch.manual_seed(0)
    tm = TYolo(spec)
    tm.eval()
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 2.0)
        x = torch.randn(1, 3, 128, 160)
        ref = [o.numpy() for o in tm(x)]

    sd = _ultra_state_dict(tm)
    params = jax.tree.map(jnp.asarray,
                          CYT.convert_yolo_state_dict(sd, spec))
    outs = Y.yolo_forward(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), spec)
    assert len(outs) == 3
    for got, want in zip(outs, ref):
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-4)
