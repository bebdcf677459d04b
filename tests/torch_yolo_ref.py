"""Torch mirror of the YOLOv8/yolo_plus detector with Ultralytics state-dict
key names (``model.{idx}.{...}``), used as the golden oracle for the detector
weight converter.

The reference's detector weights originate from Ultralytics ``.pt`` files
(train-yolo-custom-tt100k.ipynb); none are shipped (blobs stripped), so this
mirror stands in: random weights exported from here, converted by
litepi_tpu.weights.torch_import.convert_detector_state_dict, must reproduce
the Flax model's outputs.

Module indices follow the v8 yaml: 0 stem, 1 down, 2 C2f, 3 down, 4 C2f,
5 down, 6 C2f, 7 down, 8 C2f, 9 SPPF, (10 up), 11 concat, 12 C2f, (13 up),
14 concat, 15 C2f, 16 down, 17 concat, 18 C2f, 19 down, 20 concat, 21 C2f,
22 Detect(cv2 reg / cv3 cls / dfl).
"""

from typing import List

import torch
import torch.nn as nn


class ConvT(nn.Module):
    """Ultralytics Conv: conv + bn + SiLU, keys .conv/.bn."""

    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU(inplace=True)

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class BottleneckT(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = ConvT(c, c, 3)
        self.cv2 = ConvT(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2fT(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = ConvT(c1, 2 * self.c, 1)
        self.cv2 = ConvT((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(BottleneckT(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPFT(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = ConvT(c1, c_, 1)
        self.cv2 = ConvT(c_ * 4, c2, 1)
        self.m = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat((x, y1, y2, self.m(y2)), 1))


class DetectT(nn.Module):
    """v8 Detect head, raw outputs (training-mode forward)."""

    def __init__(self, nc, reg_max, ch):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(
                ConvT(c, c2, 3), ConvT(c2, c2, 3), nn.Conv2d(c2, 4 * reg_max, 1)
            )
            for c in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(ConvT(c, c3, 3), ConvT(c3, c3, 3), nn.Conv2d(c3, nc, 1))
            for c in ch
        )

    def forward(self, feats):
        reg = [m(f) for m, f in zip(self.cv2, feats)]
        cls = [m(f) for m, f in zip(self.cv3, feats)]
        return reg, cls


class YoloV8T(nn.Module):
    """The detector as an Ultralytics-keyed module list.  ``channels`` are
    the effective per-stage widths (litepi DetectorConfig.channels)."""

    def __init__(self, channels, depths, nc=1, reg_max=16,
                 neck_shortcut=True, neck_down=None):
        super().__init__()
        c = channels
        d = depths
        # yolo_plus YAMLs run residual neck C2fs (cells 28/30 pass True);
        # stock v8 passes neck_shortcut=False.  neck_down = the two PAN
        # down-conv widths (v1 widens them to the next stage width).
        ns = neck_shortcut
        dn3, dn4 = neck_down if neck_down is not None else (c[2], c[3])
        self.model = nn.ModuleList(
            [
                ConvT(3, c[0], 3, 2),                 # 0 stem
                ConvT(c[0], c[1], 3, 2),              # 1
                C2fT(c[1], c[1], d[0], True),         # 2
                ConvT(c[1], c[2], 3, 2),              # 3
                C2fT(c[2], c[2], d[1], True),         # 4
                ConvT(c[2], c[3], 3, 2),              # 5
                C2fT(c[3], c[3], d[2], True),         # 6
                ConvT(c[3], c[4], 3, 2),              # 7
                C2fT(c[4], c[4], d[3], True),         # 8
                SPPFT(c[4], c[4]),                    # 9
                nn.Upsample(scale_factor=2, mode="nearest"),  # 10
                nn.Identity(),                        # 11 concat
                C2fT(c[4] + c[3], c[3], d[0], ns),    # 12
                nn.Upsample(scale_factor=2, mode="nearest"),  # 13
                nn.Identity(),                        # 14 concat
                C2fT(c[3] + c[2], c[2], d[0], ns),    # 15
                ConvT(c[2], dn3, 3, 2),               # 16
                nn.Identity(),                        # 17 concat
                C2fT(dn3 + c[3], c[3], d[0], ns),     # 18
                ConvT(c[3], dn4, 3, 2),               # 19
                nn.Identity(),                        # 20 concat
                C2fT(dn4 + c[4], c[4], d[0], ns),     # 21
                DetectT(nc, reg_max, (c[2], c[3], c[4])),  # 22
            ]
        )

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        x = m[3](x)
        p3 = m[4](x)
        x = m[5](p3)
        p4 = m[6](x)
        x = m[7](p4)
        x = m[8](x)
        p5 = m[9](x)
        t4 = m[12](torch.cat((m[10](p5), p4), 1))
        n3 = m[15](torch.cat((m[13](t4), p3), 1))
        n4 = m[18](torch.cat((m[16](n3), t4), 1))
        n5 = m[21](torch.cat((m[19](n4), p5), 1))
        reg, cls = m[22]((n3, n4, n5))
        # flatten to (B, A, C) matching the Flax contract
        def flat(ts: List[torch.Tensor]):
            return torch.cat(
                [t.permute(0, 2, 3, 1).reshape(t.shape[0], -1, t.shape[1]) for t in ts],
                dim=1,
            )
        return flat(reg), flat(cls)
