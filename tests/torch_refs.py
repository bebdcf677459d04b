"""Golden-reference torch models for converter/parity tests.

The reference loads torchvision classifiers (e2e.py:320-347); torchvision is
not in this image, so these mirrors reproduce the torchvision architectures
*and state-dict key names* exactly (verified against torchvision's module
layout).  They act as the oracle: random weights exported from here, converted
by litepi_tpu.weights.torch_import, must produce identical outputs in Flax.
"""

import torch
import torch.nn as nn


def channel_shuffle_t(x: torch.Tensor, groups: int) -> torch.Tensor:
    b, c, h, w = x.size()
    x = x.view(b, groups, c // groups, h, w)
    x = torch.transpose(x, 1, 2).contiguous()
    return x.view(b, -1, h, w)


class InvertedResidualT(nn.Module):
    def __init__(self, inp: int, oup: int, stride: int) -> None:
        super().__init__()
        self.stride = stride
        bf = oup // 2
        if stride > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                nn.BatchNorm2d(inp),
                nn.Conv2d(inp, bf, 1, 1, 0, bias=False),
                nn.BatchNorm2d(bf),
                nn.ReLU(inplace=True),
            )
        else:
            self.branch1 = nn.Sequential()
        self.branch2 = nn.Sequential(
            nn.Conv2d(inp if stride > 1 else bf, bf, 1, 1, 0, bias=False),
            nn.BatchNorm2d(bf),
            nn.ReLU(inplace=True),
            nn.Conv2d(bf, bf, 3, stride, 1, groups=bf, bias=False),
            nn.BatchNorm2d(bf),
            nn.Conv2d(bf, bf, 1, 1, 0, bias=False),
            nn.BatchNorm2d(bf),
            nn.ReLU(inplace=True),
        )

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), dim=1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
        return channel_shuffle_t(out, 2)


class ShuffleNetV2T(nn.Module):
    def __init__(
        self,
        num_classes: int,
        repeats=(4, 8, 4),
        channels=(24, 116, 232, 464, 1024),
    ) -> None:
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, channels[0], 3, 2, 1, bias=False),
            nn.BatchNorm2d(channels[0]),
            nn.ReLU(inplace=True),
        )
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        input_c = channels[0]
        for name, reps, out_c in zip(
            ("stage2", "stage3", "stage4"), repeats, channels[1:4]
        ):
            seq = [InvertedResidualT(input_c, out_c, 2)]
            for _ in range(reps - 1):
                seq.append(InvertedResidualT(out_c, out_c, 1))
            setattr(self, name, nn.Sequential(*seq))
            input_c = out_c
        self.conv5 = nn.Sequential(
            nn.Conv2d(input_c, channels[4], 1, 1, 0, bias=False),
            nn.BatchNorm2d(channels[4]),
            nn.ReLU(inplace=True),
        )
        self.fc = nn.Linear(channels[4], num_classes)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.conv1(x)
        x = self.maxpool(x)
        x = self.stage2(x)
        x = self.stage3(x)
        x = self.stage4(x)
        x = self.conv5(x)
        x = x.mean([2, 3])
        return self.fc(x)


class BasicBlockT(nn.Module):
    def __init__(self, inp: int, out: int, stride: int = 1) -> None:
        super().__init__()
        self.conv1 = nn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out)
        if stride != 1 or inp != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inp, out, 1, stride, bias=False), nn.BatchNorm2d(out)
            )
        else:
            self.downsample = None

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + identity)


class ResNet18T(nn.Module):
    def __init__(self, num_classes: int) -> None:
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inp = 64
        for layer, blocks in enumerate((2, 2, 2, 2), start=1):
            out = 64 * (2 ** (layer - 1))
            seq = []
            for i in range(blocks):
                stride = 2 if (layer > 1 and i == 0) else 1
                seq.append(BasicBlockT(inp, out, stride))
                inp = out
            setattr(self, f"layer{layer}", nn.Sequential(*seq))
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = x.mean([2, 3])
        return self.fc(x)


def export_real_onnx(
    model: nn.Module,
    example: torch.Tensor,
    path: str,
    fused: bool = True,
    opset: int = 18,
) -> None:
    """Run the REAL ``torch.onnx.export`` toolchain (torchscript exporter)
    on a mirror model — the same flow the reference's
    convert-model-classify.ipynb cells 3-4 use.

    ``fused=True`` is the exporter's eval default: the jit eval peephole
    folds every Conv+BN and renames the fused initializers to anonymous
    ``onnx::Conv_NNNN``.  ``fused=False`` (``do_constant_folding=False`` +
    ``TrainingMode.PRESERVE``) keeps BatchNormalization nodes and
    state-dict initializer names.

    One shim: this environment has no ``onnx`` package, and the exporter's
    last step (``_add_onnxscript_fn``) imports it only to splice CUSTOM
    onnxscript functions into the already-serialized proto — a no-op for
    standard-domain graphs like these.  Patching it to passthrough leaves
    every byte of the proto produced by torch's own C++ serializer.
    """
    from torch.onnx import TrainingMode
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, co: model_bytes
    try:
        kwargs = (
            {}
            if fused
            else dict(
                do_constant_folding=False, training=TrainingMode.PRESERVE
            )
        )
        torch.onnx.export(
            model,
            (example,),
            path,
            opset_version=opset,
            dynamo=False,
            input_names=["images"],
            output_names=["out"],
            **kwargs,
        )
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def randomize_bn_stats(model: nn.Module, seed: int = 0) -> None:
    """Give BN layers non-trivial running stats so parity tests catch
    mean/var mapping bugs (fresh models have mean 0 / var 1)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)


class ConvBNReLU6T(nn.Sequential):
    def __init__(self, inp, out, k=3, stride=1, groups=1):
        super().__init__(
            nn.Conv2d(inp, out, k, stride, k // 2, groups=groups, bias=False),
            nn.BatchNorm2d(out),
            nn.ReLU6(inplace=True),
        )


class InvertedResidualV2T(nn.Module):
    """torchvision.models.mobilenetv2.InvertedResidual mirror (same keys)."""

    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        self.stride = stride
        hidden = inp * expand_ratio
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(ConvBNReLU6T(inp, hidden, k=1))
        layers += [
            ConvBNReLU6T(hidden, hidden, stride=stride, groups=hidden),
            nn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
            nn.BatchNorm2d(oup),
        ]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class MobileNetV2T(nn.Module):
    """torchvision mobilenet_v2 mirror (state-dict-key compatible)."""

    SETTINGS = [
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
    ]

    def __init__(self, num_classes):
        super().__init__()
        features = [ConvBNReLU6T(3, 32, stride=2)]
        inp = 32
        for t, c, n, s in self.SETTINGS:
            for i in range(n):
                features.append(
                    InvertedResidualV2T(inp, c, s if i == 0 else 1, t)
                )
                inp = c
        features.append(ConvBNReLU6T(inp, 1280, k=1))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(1280, num_classes)
        )

    def forward(self, x):
        x = self.features(x)
        x = x.mean([2, 3])
        return self.classifier(x)


class ConvBNSiLUT(nn.Sequential):
    def __init__(self, inp, out, k=3, stride=1, groups=1, act=True):
        layers = [
            nn.Conv2d(inp, out, k, stride, k // 2, groups=groups, bias=False),
            nn.BatchNorm2d(out),  # torchvision b0: default eps 1e-5
        ]
        if act:
            layers.append(nn.SiLU(inplace=True))
        super().__init__(*layers)


class SqueezeExcitationT(nn.Module):
    """torchvision.ops.SqueezeExcitation mirror (keys fc1/fc2)."""

    def __init__(self, input_c, squeeze_c):
        super().__init__()
        self.fc1 = nn.Conv2d(input_c, squeeze_c, 1)
        self.fc2 = nn.Conv2d(squeeze_c, input_c, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.nn.functional.silu(self.fc1(s))
        return x * torch.sigmoid(self.fc2(s))


class MBConvT(nn.Module):
    """torchvision.models.efficientnet.MBConv mirror (block.N keys)."""

    def __init__(self, inp, oup, kernel, stride, expand):
        super().__init__()
        hidden = inp * expand
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expand != 1:
            layers.append(ConvBNSiLUT(inp, hidden, k=1))
        layers += [
            ConvBNSiLUT(hidden, hidden, k=kernel, stride=stride, groups=hidden),
            SqueezeExcitationT(hidden, max(1, inp // 4)),
            ConvBNSiLUT(hidden, oup, k=1, act=False),
        ]
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.block(x) if self.use_res else self.block(x)


class EfficientNetB0T(nn.Module):
    """torchvision efficientnet_b0 mirror (state-dict-key compatible)."""

    SETTINGS = [
        (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
        (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
        (6, 320, 1, 1, 3),
    ]

    def __init__(self, num_classes):
        super().__init__()
        stages = [ConvBNSiLUT(3, 32, stride=2)]
        inp = 32
        for t, c, n, s, k in self.SETTINGS:
            blocks = []
            for i in range(n):
                blocks.append(MBConvT(inp, c, k, s if i == 0 else 1, t))
                inp = c
            stages.append(nn.Sequential(*blocks))
        stages.append(ConvBNSiLUT(inp, 1280, k=1))
        self.features = nn.Sequential(*stages)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(1280, num_classes)
        )

    def forward(self, x):
        x = self.features(x)
        x = x.mean([2, 3])
        return self.classifier(x)
