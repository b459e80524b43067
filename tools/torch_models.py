"""Independent plain-torch implementations of the checkpointed model zoo.

Cross-framework validation harness (VERDICT r3 next-round #1): these modules
re-implement ShuffleNetV2K + ResNet + CompositeField4 semantics from
SURVEY.md §2.2 (reference ``src/openpifpaf/network/basenetworks.py:~200``,
``heads.py:~200``) directly in ``torch.nn`` — NOT by calling any code from
``openpifpaf_tpu.models``.  Their state-dict naming matches the reference
checkpoints (``base_net.conv1.0.weight``, ``head_nets.0.conv.weight``, ...),
so ``converter.to_torch_state_dict`` output loads with ``strict=True``.

Running the same weights through torch's conv/BN kernels and through the
flax forward is the only in-environment test that can catch cross-framework
convention bugs (conv padding, BN epsilon/affine order, PixelShuffle channel
order, channel-shuffle interleaving) before they silently void
converted-checkpoint AP parity.  Used by ``tests/test_torch_crossval.py``
and kept here for the mounted-day parity run
(``tools/parity_when_mounted.py``).
"""

from __future__ import annotations

from typing import List, Sequence

import torch
from torch import nn


def channel_shuffle(x: torch.Tensor, groups: int = 2) -> torch.Tensor:
    b, c, h, w = x.shape
    x = x.view(b, groups, c // groups, h, w)
    x = x.transpose(1, 2).contiguous()
    return x.view(b, c, h, w)


class InvertedResidualK(nn.Module):
    """ShuffleNetV2 block with configurable depthwise kernel (NCHW)."""

    def __init__(self, in_channels: int, out_channels: int, stride: int,
                 kernel_size: int = 5):
        super().__init__()
        self.stride = stride
        branch_features = out_channels // 2
        pad = kernel_size // 2

        if stride > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(in_channels, in_channels, kernel_size,
                          stride=stride, padding=pad, groups=in_channels,
                          bias=False),
                nn.BatchNorm2d(in_channels),
                nn.Conv2d(in_channels, branch_features, 1, bias=False),
                nn.BatchNorm2d(branch_features),
                nn.ReLU(inplace=True),
            )
            branch2_in = in_channels
        else:
            self.branch1 = nn.Sequential()
            branch2_in = in_channels // 2

        self.branch2 = nn.Sequential(
            nn.Conv2d(branch2_in, branch_features, 1, bias=False),
            nn.BatchNorm2d(branch_features),
            nn.ReLU(inplace=True),
            nn.Conv2d(branch_features, branch_features, kernel_size,
                      stride=stride, padding=pad, groups=branch_features,
                      bias=False),
            nn.BatchNorm2d(branch_features),
            nn.Conv2d(branch_features, branch_features, 1, bias=False),
            nn.BatchNorm2d(branch_features),
            nn.ReLU(inplace=True),
        )

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), dim=1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
        return channel_shuffle(out, 2)


class ShuffleNetV2K(nn.Module):
    """conv1 (3x3/2, no maxpool) + 3 stages + conv5; total stride 16."""

    def __init__(self, stages_repeats: Sequence[int],
                 stages_out_channels: Sequence[int], kernel_size: int = 5):
        super().__init__()
        c0 = stages_out_channels[0]
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, c0, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(c0),
            nn.ReLU(inplace=True),
        )
        in_ch = c0
        for stage_i, (repeats, out_ch) in enumerate(
                zip(stages_repeats, stages_out_channels[1:4]), start=2):
            blocks = [InvertedResidualK(in_ch, out_ch, 2, kernel_size)]
            for _ in range(1, repeats):
                blocks.append(InvertedResidualK(out_ch, out_ch, 1,
                                                kernel_size))
            setattr(self, f'stage{stage_i}', nn.Sequential(*blocks))
            in_ch = out_ch
        c_last = stages_out_channels[-1]
        self.conv5 = nn.Sequential(
            nn.Conv2d(in_ch, c_last, 1, bias=False),
            nn.BatchNorm2d(c_last),
            nn.ReLU(inplace=True),
        )
        self.out_features = c_last

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.conv1(x)
        x = self.stage2(x)
        x = self.stage3(x)
        x = self.stage4(x)
        return self.conv5(x)


class Bottleneck(nn.Module):
    def __init__(self, in_channels: int, out_channels: int, stride: int = 1,
                 dilation: int = 1):
        super().__init__()
        width = out_channels // 4
        self.conv1 = nn.Conv2d(in_channels, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, out_channels, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_channels)
        self.relu = nn.ReLU(inplace=True)
        if in_channels != out_channels or stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_channels, out_channels, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(out_channels),
            )
        else:
            self.downsample = None

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        residual = self.downsample(x) if self.downsample is not None else x
        return self.relu(y + residual)


class ResNet(nn.Module):
    """ResNet trunk, input maxpool removed (total stride 16)."""

    def __init__(self, layers: Sequence[int]):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        channels = (256, 512, 1024, 2048)
        strides = (1, 2, 2, 2)
        in_ch = 64
        for stage_i, (n_blocks, ch, s) in enumerate(
                zip(layers, channels, strides), start=1):
            blocks = [Bottleneck(in_ch, ch, s)]
            for _ in range(1, n_blocks):
                blocks.append(Bottleneck(ch, ch, 1))
            setattr(self, f'layer{stage_i}', nn.Sequential(*blocks))
            in_ch = ch
        self.out_features = 2048

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


class CompositeField4(nn.Module):
    """1x1-conv head -> (B, F, C, H, W); optional PixelShuffle upsample."""

    def __init__(self, in_features: int, n_fields: int, n_components: int,
                 upsample_stride: int = 1):
        super().__init__()
        self.n_fields = n_fields
        self.n_components = n_components
        self.upsample_stride = upsample_stride
        u = upsample_stride
        self.conv = nn.Conv2d(in_features,
                              n_fields * n_components * u * u, 1, bias=True)
        self.upsample = nn.PixelShuffle(u) if u > 1 else None

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.conv(x)
        if self.upsample is not None:
            x = self.upsample(x)
            cut = self.upsample_stride // 2
            x = x[:, :, cut:x.shape[2] - cut + 1, cut:x.shape[3] - cut + 1]
        b, _, h, w = x.shape
        return x.view(b, self.n_fields, self.n_components, h, w)


class Shell(nn.Module):
    """base_net + head_nets, reference naming for state-dict parity."""

    def __init__(self, base_net: nn.Module, head_nets: Sequence[nn.Module]):
        super().__init__()
        self.base_net = base_net
        self.head_nets = nn.ModuleList(head_nets)

    def forward(self, x: torch.Tensor) -> List[torch.Tensor]:
        features = self.base_net(x)
        return [head(features) for head in self.head_nets]


_BASENETS = {
    'shufflenetv2k16': lambda: ShuffleNetV2K(
        (4, 8, 4), (24, 348, 696, 1392, 1392)),
    'shufflenetv2k30': lambda: ShuffleNetV2K(
        (8, 16, 6), (32, 512, 1024, 2048, 2048)),
    'shufflenetv2k44': lambda: ShuffleNetV2K(
        (12, 24, 8), (32, 512, 1024, 2048, 2048)),
    'shufflenetv2x1': lambda: ShuffleNetV2K(
        (4, 8, 4), (24, 116, 232, 464, 1024), kernel_size=3),
    'shufflenetv2x2': lambda: ShuffleNetV2K(
        (4, 8, 4), (24, 244, 488, 976, 2048), kernel_size=3),
    'resnet50': lambda: ResNet((3, 4, 6, 3)),
    'resnet101': lambda: ResNet((3, 4, 23, 3)),
    'resnet152': lambda: ResNet((3, 8, 36, 3)),
}


def build_shell(basenet_name: str, head_specs: Sequence[tuple],
                upsample_stride: int = 1) -> Shell:
    """head_specs: [(n_fields, n_components), ...] per head."""
    base = _BASENETS[basenet_name]()
    heads = [CompositeField4(base.out_features, f, c, upsample_stride)
             for f, c in head_specs]
    return Shell(base, heads)
