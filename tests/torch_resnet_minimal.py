"""Minimal hand-rolled torch ResNet backbone (BasicBlock depths 18/34).

The reference's backbone (/root/reference/models/backbone/resnet.py:6-75)
wraps torchvision's ResNet, strips avgpool/fc, and exposes stem +
layer1..4 returning (c1..c4) at strides 4/8/16/32. torchvision is NOT
installed in this environment, so full-model parity tests need a
dependency-free twin with the same math. This module is that twin:
standard BasicBlock semantics, parameter names matching the reference
wrapper's state_dict layout (``stem_conv`` / ``stem_bn`` /
``layerN.M.convK`` / ``layerN.M.downsample.{0,1}``) so
``models/torch_convert.export_reference_backbone`` output loads with
``strict=True``.
"""

import torch.nn as nn


class BasicBlock(nn.Module):
    def __init__(self, cin: int, cout: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + identity)


class MinimalResNetBackbone(nn.Module):
    """Returns (c1, c2, c3, c4) at strides 4/8/16/32 — the reference
    backbone contract (resnet.py:63-75)."""

    STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}

    def __init__(self, depth: int = 18):
        super().__init__()
        blocks = self.STAGE_BLOCKS[depth]
        self.stem_conv = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.stem_bn = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, (cout, n) in enumerate(
            zip((64, 128, 256, 512), blocks), start=1
        ):
            layers = []
            for b in range(n):
                stride = 2 if (b == 0 and i > 1) else 1
                layers.append(BasicBlock(cin, cout, stride))
                cin = cout
            setattr(self, f"layer{i}", nn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.stem_bn(self.stem_conv(x))))
        c1 = self.layer1(x)
        c2 = self.layer2(c1)
        c3 = self.layer3(c2)
        c4 = self.layer4(c3)
        return c1, c2, c3, c4
