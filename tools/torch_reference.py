"""Independent torch-CPU re-implementation of the reference network.

Used ONLY as a parity oracle and golden-file generator (SURVEY.md §4): the
reference repo (``main/model.py``, ``common/nets/resnet.py``) builds a
torchvision ResNet backbone plus a 3-deconv head; this file re-derives that
architecture from the paper/torchvision semantics so converted Flax weights
can be checked numerically without torchvision installed (it is absent in
this environment).

Also doubles as the state_dict producer for ``convert_torch_ckpt.py`` tests:
its state_dict keys follow torchvision naming (conv1, bn1, layer1.0.conv1,
layer1.0.downsample.0, ...), so a real torchvision checkpoint loads into it
directly.
"""

from __future__ import annotations

import torch
import torch.nn as nn

RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        # v1.5: stride on the 3x3 (torchvision semantics)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class ResNetBackbone(nn.Module):
    """torchvision ResNet minus avgpool/fc (stride-32 feature map)."""

    def __init__(self, resnet_type=50):
        super().__init__()
        kind, depths = RESNET_SPECS[resnet_type]
        block = BasicBlock if kind == "basic" else Bottleneck
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, depths[0])
        self.layer2 = self._make_layer(block, 128, depths[1], stride=2)
        self.layer3 = self._make_layer(block, 256, depths[2], stride=2)
        self.layer4 = self._make_layer(block, 512, depths[3], stride=2)

    def _make_layer(self, block, planes, depth, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, depth):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


class HeadNet(nn.Module):
    """3 x [ConvTranspose2d(256, k4, s2, p1) + BN + ReLU] + 1x1 conv."""

    def __init__(self, in_features, out_channels, num_layers=3, features=256):
        super().__init__()
        layers = []
        inc = in_features
        for _ in range(num_layers):
            layers += [
                nn.ConvTranspose2d(inc, features, 4, 2, 1, bias=False),
                nn.BatchNorm2d(features),
                nn.ReLU(inplace=True),
            ]
            inc = features
        self.deconv = nn.Sequential(*layers)
        self.final = nn.Conv2d(features, out_channels, 1)

    def forward(self, x):
        return self.final(self.deconv(x))


class PoseNet(nn.Module):
    def __init__(self, resnet_type=50, joint_num=18, depth_dim=64):
        super().__init__()
        self.backbone = ResNetBackbone(resnet_type)
        kind, _ = RESNET_SPECS[resnet_type]
        feats = 512 * (4 if kind == "bottleneck" else 1)
        self.head = HeadNet(feats, joint_num * depth_dim)

    def forward(self, x):
        return self.head(self.backbone(x))


def soft_argmax_3d(heatmap: torch.Tensor, joint_num: int, depth_dim: int):
    """Reference-semantics integral (``common/nets/loss.py:soft_argmax``)."""
    b = heatmap.shape[0]
    h, w = heatmap.shape[2], heatmap.shape[3]
    hm = heatmap.reshape(b, joint_num, depth_dim * h * w)
    p = torch.softmax(hm, dim=2).reshape(b, joint_num, depth_dim, h, w)
    accu_x = p.sum(dim=(2, 3))
    accu_y = p.sum(dim=(2, 4))
    accu_z = p.sum(dim=(3, 4))
    x = (accu_x * torch.arange(w, dtype=torch.float32)).sum(dim=2)
    y = (accu_y * torch.arange(h, dtype=torch.float32)).sum(dim=2)
    z = (accu_z * torch.arange(depth_dim, dtype=torch.float32)).sum(dim=2)
    return torch.stack([x, y, z], dim=2)
