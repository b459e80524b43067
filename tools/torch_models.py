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

import math
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


def _same_pad(x: torch.Tensor, kernel: int, stride: int) -> torch.Tensor:
    """XLA SAME padding semantics (extra padding goes to the right/bottom)."""
    _, _, h, w = x.shape

    def pads(size):
        out = -(-size // stride)
        total = max(0, (out - 1) * stride + kernel - size)
        return total // 2, total - total // 2

    t, b = pads(h)
    l, r = pads(w)
    return nn.functional.pad(x, (l, r, t, b))


def swin_relative_position_index(w: int) -> torch.Tensor:
    """(w*w, w*w) indices into the (2w-1)^2 bias table (microsoft layout)."""
    coords = torch.stack(torch.meshgrid(torch.arange(w), torch.arange(w),
                                        indexing='ij')).flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0) + (w - 1)
    return rel[..., 0] * (2 * w - 1) + rel[..., 1]


class SwinWindowAttention(nn.Module):
    """Microsoft-Swin window attention: packed qkv + relative bias table."""

    def __init__(self, dim: int, num_heads: int, window: int):
        super().__init__()
        self.dim = dim
        self.num_heads = num_heads
        self.window = window
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window - 1) ** 2, num_heads))
        self.register_buffer('relative_position_index',
                             swin_relative_position_index(window),
                             persistent=False)

    def forward(self, x: torch.Tensor, mask: torch.Tensor = None):
        n, l, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = self.qkv(x).reshape(n, l, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
        attn = (q * head_dim ** -0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(
            l, l, self.num_heads).permute(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(n // nw, nw, self.num_heads, l, l)
            attn = attn + mask[None, :, None]
            attn = attn.view(n, self.num_heads, l, l)
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(n, l, self.dim)
        return self.proj(y)


class SwinBlock(nn.Module):
    def __init__(self, dim: int, num_heads: int, window: int = 7,
                 shift: int = 0, mlp_ratio: float = 4.0):
        super().__init__()
        self.window = window
        self.shift = shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = SwinWindowAttention(dim, num_heads, window)
        self.norm2 = nn.LayerNorm(dim)
        # microsoft-Swin naming: mlp.fc1 / mlp.fc2 (reference checkpoints)
        self.mlp = nn.ModuleDict({
            'fc1': nn.Linear(dim, int(dim * mlp_ratio)),
            'fc2': nn.Linear(int(dim * mlp_ratio), dim),
        })

    @staticmethod
    def _partition(x: torch.Tensor, w: int) -> torch.Tensor:
        b, h, ww, c = x.shape
        x = x.view(b, h // w, w, ww // w, w, c)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)

    @staticmethod
    def _reverse(windows: torch.Tensor, w: int, h: int, ww: int):
        b = windows.shape[0] // ((h // w) * (ww // w))
        x = windows.view(b, h // w, ww // w, w, w, -1)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)

    def _attn_mask(self, hp: int, wp: int) -> torch.Tensor:
        win, shift = self.window, self.shift
        img_mask = torch.zeros(hp, wp)
        cnt = 0
        for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            for ws in (slice(0, -win), slice(-win, -shift),
                       slice(-shift, None)):
                img_mask[hs, ws] = cnt
                cnt += 1
        m = self._partition(img_mask[None, :, :, None], win)[..., 0]
        diff = m[:, None, :] - m[:, :, None]
        return torch.where(diff != 0, -100.0, 0.0)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        """x: (B, H, W, C) channels-last."""
        b, h, w, c = x.shape
        win = self.window
        shortcut = x
        x = self.norm1(x)
        pad_h = (win - h % win) % win
        pad_w = (win - w % win) % win
        x = nn.functional.pad(x, (0, 0, 0, pad_w, 0, pad_h))
        hp, wp = h + pad_h, w + pad_w
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            mask = self._attn_mask(hp, wp)
        else:
            mask = None
        windows = self._partition(x, win)
        windows = self.attn(windows, mask)
        x = self._reverse(windows, win, hp, wp)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = x[:, :h, :w]
        x = shortcut + x
        y = self.mlp['fc2'](nn.functional.gelu(
            self.mlp['fc1'](self.norm2(x))))
        return x + y


class SwinPatchMerging(nn.Module):
    def __init__(self, in_dim: int):
        super().__init__()
        self.norm = nn.LayerNorm(4 * in_dim)
        self.reduction = nn.Linear(4 * in_dim, 2 * in_dim, bias=False)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        b, h, w, c = x.shape
        x = nn.functional.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], dim=-1)
        return self.reduction(self.norm(x))


class SwinLayer(nn.Module):
    """One Swin stage: blocks + trailing downsample (microsoft layout)."""

    def __init__(self, dim: int, depth: int, num_heads: int, window: int,
                 downsample: str = None):
        super().__init__()
        self.blocks = nn.ModuleList([
            SwinBlock(dim, num_heads, window,
                      shift=0 if i % 2 == 0 else window // 2)
            for i in range(depth)])
        if downsample == 'merge':
            self.downsample = SwinPatchMerging(dim)
        elif downsample == 'proj':
            # stride-16 dense-prediction adaptation: channel projection
            # instead of the final patch merging (matches models/swin.py)
            self.proj = nn.Linear(dim, 2 * dim, bias=False)
            self.downsample = None
        else:
            self.downsample = None

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        for block in self.blocks:
            x = block(x)
        if self.downsample is not None:
            x = self.downsample(x)
        elif hasattr(self, 'proj'):
            x = self.proj(x)
        return x


class Swin(nn.Module):
    """Stride-16 Swin trunk, channels-last internally, NCHW interface."""

    def __init__(self, embed_dim: int, depths: Sequence[int],
                 num_heads: Sequence[int], window: int = 7):
        super().__init__()
        self.patch_embed = nn.ModuleDict({
            'proj': nn.Conv2d(3, embed_dim, 4, stride=4),
            'norm': nn.LayerNorm(embed_dim),
        })
        self.layers = nn.ModuleList()
        for i, (depth, heads) in enumerate(zip(depths, num_heads)):
            dim = embed_dim * (2 ** min(i, 3))
            downsample = ('merge' if i < 2 else
                          'proj' if i == 2 else None)
            self.layers.append(SwinLayer(dim, depth, heads, window,
                                         downsample))
        self.norm = nn.LayerNorm(embed_dim * 8)
        self.out_features = embed_dim * 8

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.patch_embed['proj'](_same_pad(x, 4, 4))
        x = x.permute(0, 2, 3, 1)                 # channels-last
        x = self.patch_embed['norm'](x)
        for layer in self.layers:
            x = layer(x)
        x = self.norm(x)
        return x.permute(0, 3, 1, 2)


class PositionalEncodingFourier(nn.Module):
    """Fourier positional encoding, reference xcit.py naming
    (``pos_embeder.token_projection``)."""

    def __init__(self, dim: int, hidden_dim: int = 32,
                 temperature: float = 10000.0):
        super().__init__()
        self.token_projection = nn.Conv2d(hidden_dim * 2, dim, 1)
        self.hidden_dim = hidden_dim
        self.temperature = temperature

    def forward(self, b: int, h: int, w: int) -> torch.Tensor:
        scale = 2.0 * math.pi
        eps = 1e-6
        ones = torch.ones(1, h, w)
        y_embed = ones.cumsum(1) / (h + eps) * scale
        x_embed = ones.cumsum(2) / (w + eps) * scale
        dim_t = torch.arange(self.hidden_dim, dtype=torch.float32)
        dim_t = self.temperature ** (2 * (dim_t // 2) / self.hidden_dim)
        pos_x = x_embed[..., None] / dim_t
        pos_y = y_embed[..., None] / dim_t
        pos_x = torch.stack((pos_x[..., 0::2].sin(),
                             pos_x[..., 1::2].cos()), dim=4).flatten(3)
        pos_y = torch.stack((pos_y[..., 0::2].sin(),
                             pos_y[..., 1::2].cos()), dim=4).flatten(3)
        pos = torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)
        return self.token_projection(pos).expand(b, -1, -1, -1)


class XCA(nn.Module):
    """Cross-covariance attention (channel attention, F.normalize q/k)."""

    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.temperature = nn.Parameter(torch.ones(num_heads, 1, 1))

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        b, n, c = x.shape
        head_dim = c // self.num_heads
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = (t.transpose(-2, -1) for t in qkv)   # (b, heads, d, n)
        q = nn.functional.normalize(q, dim=-1)
        k = nn.functional.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        attn = attn.softmax(dim=-1)
        y = (attn @ v).permute(0, 3, 1, 2).reshape(b, n, c)
        return self.proj(y)


class LPI(nn.Module):
    """Local patch interaction: dwconv -> gelu -> bn -> dwconv."""

    def __init__(self, dim: int):
        super().__init__()
        self.conv1 = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)
        self.bn = nn.BatchNorm2d(dim)
        self.conv2 = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)

    def forward(self, x: torch.Tensor, h: int, w: int) -> torch.Tensor:
        b, n, c = x.shape
        x = x.permute(0, 2, 1).reshape(b, c, h, w)
        x = self.conv2(self.bn(nn.functional.gelu(self.conv1(x))))
        return x.reshape(b, c, n).permute(0, 2, 1)


class XCABlock(nn.Module):
    """XCA -> LPI -> MLP with LayerScale gammas (reference slot naming:
    norm1 gates attn, norm3 gates local_mp, norm2 gates mlp)."""

    def __init__(self, dim: int, num_heads: int, mlp_ratio: float = 4.0,
                 eta: float = 1.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = XCA(dim, num_heads)
        self.norm3 = nn.LayerNorm(dim)
        self.local_mp = LPI(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.ModuleDict({
            'fc1': nn.Linear(dim, int(dim * mlp_ratio)),
            'fc2': nn.Linear(int(dim * mlp_ratio), dim),
        })
        self.gamma1 = nn.Parameter(eta * torch.ones(dim))
        self.gamma3 = nn.Parameter(eta * torch.ones(dim))
        self.gamma2 = nn.Parameter(eta * torch.ones(dim))

    def forward(self, x: torch.Tensor, h: int, w: int) -> torch.Tensor:
        x = x + self.gamma1 * self.attn(self.norm1(x))
        x = x + self.gamma3 * self.local_mp(self.norm3(x), h, w)
        x = x + self.gamma2 * self.mlp['fc2'](
            nn.functional.gelu(self.mlp['fc1'](self.norm2(x))))
        return x


def _xcit_conv3x3(cin: int, cout: int) -> nn.Sequential:
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, stride=2, padding=1, bias=False),
        nn.BatchNorm2d(cout))


class XCiT(nn.Module):
    """Stride-16 dense XCiT trunk, reference (facebookresearch) naming;
    the classification tail (cls_token / cls_attn_blocks) is dropped."""

    def __init__(self, embed_dim: int, depth: int, num_heads: int):
        super().__init__()
        d = embed_dim
        self.patch_embed = nn.ModuleDict({'proj': nn.Sequential(
            _xcit_conv3x3(3, d // 8), nn.GELU(),
            _xcit_conv3x3(d // 8, d // 4), nn.GELU(),
            _xcit_conv3x3(d // 4, d // 2), nn.GELU(),
            _xcit_conv3x3(d // 2, d),
        )})
        self.pos_embeder = PositionalEncodingFourier(d)
        self.blocks = nn.ModuleList(
            [XCABlock(d, num_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(d)
        self.out_features = d

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.patch_embed['proj'](x)
        b, c, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)                  # (b, n, c)
        pos = self.pos_embeder(b, h, w).flatten(2).transpose(1, 2)
        x = x + pos
        for blk in self.blocks:
            x = blk(x, h, w)
        x = self.norm(x)
        return x.transpose(1, 2).reshape(b, c, h, w)


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
    'swin_t': lambda: Swin(96, (2, 2, 6, 2), (3, 6, 12, 24)),
    'swin_s': lambda: Swin(96, (2, 2, 18, 2), (3, 6, 12, 24)),
    'swin_b': lambda: Swin(128, (2, 2, 18, 2), (4, 8, 16, 32)),
    'xcit_small_12': lambda: XCiT(384, 12, 8),
    'xcit_medium_24': lambda: XCiT(512, 24, 8),
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
