"""PyTorch re-derivation of the reference-family architecture.

PROVENANCE: the reference mount at /root/reference was EMPTY (SURVEY.md
§Provenance), so golden outputs for parity testing cannot come from the
reference itself. Per SURVEY §4.1 they come from this torch-CPU
re-derivation of the same architecture (monodepth2/DispNetC lineage, the
E1/E2-grade spec), committed together with its generating script
(tools/make_goldens.py) so provenance is auditable. This file is used
ONLY for golden generation and the CPU baseline measurement — the
framework itself never imports torch outside utils/torch_import.py.

Module names are chosen to match torchvision's ResNet naming (encoder)
and our Flax module naming (decoder/stereo) so utils/torch_import.py can
ingest the state dicts exactly like it would ingest reference .pth files.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# ResNet-18 encoder (torchvision-equivalent, hand-written: torchvision is
# not installed in this image).
# ---------------------------------------------------------------------------


class BasicBlock(nn.Module):
    def __init__(self, cin: int, cout: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(y + identity)


class Bottleneck(nn.Module):
    """torchvision v1.5 Bottleneck (stride on the 3x3), expansion 4."""

    def __init__(self, cin: int, width: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, 4 * width, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(4 * width)
        if stride != 1 or cin != 4 * width:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, 4 * width, 1, stride, bias=False),
                nn.BatchNorm2d(4 * width),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(y + identity)


class ResNetEncoder(nn.Module):
    """5-level pyramid: relu(bn(conv1)), layer1..layer4 (strides /2../32)."""

    def __init__(self, num_layers: int = 18, in_ch: int = 3):
        super().__init__()
        assert num_layers in (18, 34, 50)
        self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans = [64, 128, 256, 512]
        blocks = [2, 2, 2, 2] if num_layers == 18 else [3, 4, 6, 3]
        bottleneck = num_layers == 50
        cin = 64
        for i, (c, n) in enumerate(zip(chans, blocks)):
            layers = []
            for b in range(n):
                stride = 2 if (b == 0 and i > 0) else 1
                if bottleneck:
                    layers.append(Bottleneck(cin, c, stride))
                    cin = 4 * c
                else:
                    layers.append(BasicBlock(cin, c, stride))
                    cin = c
            setattr(self, f"layer{i + 1}", nn.Sequential(*layers))

    def forward(self, x):
        feats = []
        y = F.relu(self.bn1(self.conv1(x)))
        feats.append(y)
        y = self.maxpool(y)
        for i in range(1, 5):
            y = getattr(self, f"layer{i}")(y)
            feats.append(y)
        return feats


# ---------------------------------------------------------------------------
# U-Net depth decoder (mirrors models/unet_decoder.py).
# ---------------------------------------------------------------------------


class ConvBlock(nn.Module):
    """reflect-pad 3x3 conv + ELU; submodule named 'conv' to match Flax."""

    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3)

    def forward(self, x):
        return F.elu(self.conv(F.pad(x, (1, 1, 1, 1), mode="reflect")))


class DispHead(nn.Module):
    def __init__(self, cin: int):
        super().__init__()
        self.conv = nn.Conv2d(cin, 1, 3)

    def forward(self, x):
        return torch.sigmoid(self.conv(F.pad(x, (1, 1, 1, 1), mode="reflect")))


class DepthDecoder(nn.Module):
    def __init__(
        self,
        num_ch_enc=(64, 64, 128, 256, 512),
        num_ch_dec=(16, 32, 64, 128, 256),
        scales=(0, 1, 2, 3),
    ):
        super().__init__()
        self.scales = scales
        self.num_ch_dec = num_ch_dec
        for i in range(4, -1, -1):
            cin = num_ch_enc[-1] if i == 4 else num_ch_dec[i + 1]
            setattr(self, f"upconv_{i}_0", ConvBlock(cin, num_ch_dec[i]))
            cin2 = num_ch_dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
            setattr(self, f"upconv_{i}_1", ConvBlock(cin2, num_ch_dec[i]))
        for s in scales:
            setattr(self, f"dispconv_{s}", DispHead(num_ch_dec[s]))

    def forward(self, feats):
        out = {}
        x = feats[-1]
        for i in range(4, -1, -1):
            x = getattr(self, f"upconv_{i}_0")(x)
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i > 0:
                x = torch.cat([x, feats[i - 1]], dim=1)
            x = getattr(self, f"upconv_{i}_1")(x)
            if i in self.scales:
                out[i] = getattr(self, f"dispconv_{i}")(x)
        return out


class MonoDepthNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = ResNetEncoder()
        self.decoder = DepthDecoder()

    def forward(self, x):
        return self.decoder(self.encoder(x))


# ---------------------------------------------------------------------------
# Pose network (mirrors models/posenet.py; monodepth2-family layout).
#
# The family's PoseDecoder predicts ``num_frames_to_predict_for=2``
# frames (12 output channels) and the trainer uses only the first
# 6-vector; it serializes its convs through
# ``nn.ModuleList([squeeze, pose0, pose1, pose2])`` → ``net.N.*`` keys
# (UNVERIFIED vs the empty reference mount; family convention). Our
# Flax PoseNet predicts the used 6-vector directly; the importer slices
# a 12-channel head to its first 6.
# ---------------------------------------------------------------------------


class PoseNetTorch(nn.Module):
    def __init__(self, num_frames_to_predict_for: int = 2):
        super().__init__()
        self.encoder = ResNetEncoder(in_ch=6)
        self.squeeze = nn.Conv2d(512, 256, 1)
        self.pose_0 = nn.Conv2d(256, 256, 3, 1, 1)
        self.pose_1 = nn.Conv2d(256, 256, 3, 1, 1)
        self.pose_2 = nn.Conv2d(256, 6 * num_frames_to_predict_for, 1)

    def forward(self, pair):
        f = self.encoder(pair)[-1]
        y = F.relu(self.squeeze(f))
        y = F.relu(self.pose_0(y))
        y = F.relu(self.pose_1(y))
        y = self.pose_2(y)
        y = 0.01 * y.mean(3).mean(2)  # (B, 6*K), frame-0 pose first
        return y[:, :3], y[:, 3:6]


# ---------------------------------------------------------------------------
# Stereo network (mirrors models/stereo.py).
# ---------------------------------------------------------------------------


class ConvRelu(nn.Module):
    def __init__(self, cin, cout, stride=1, kernel=3):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel, stride, kernel // 2)

    def forward(self, x):
        return F.relu(self.conv(x))


class FeatureTower(nn.Module):
    def __init__(self, channels=64):
        super().__init__()
        self.down1 = ConvRelu(3, 32, stride=2, kernel=5)
        self.down2 = ConvRelu(32, channels, stride=2, kernel=5)
        self.refine1 = ConvRelu(channels, channels)
        self.refine2 = ConvRelu(channels, channels)

    def forward(self, x):
        return self.refine2(self.refine1(self.down2(self.down1(x))))


def correlation1d(fl: torch.Tensor, fr: torch.Tensor, max_disp: int) -> torch.Tensor:
    """(B, C, H, W) pair → (B, D, H, W) mean-over-C correlation, zero pad."""
    b, c, h, w = fl.shape
    out = fl.new_zeros((b, max_disp, h, w))
    for d in range(max_disp):
        if d == 0:
            out[:, 0] = (fl * fr).mean(dim=1)
        else:
            out[:, d, :, d:] = (fl[:, :, :, d:] * fr[:, :, :, :-d]).mean(dim=1)
    return out


class CostAggregation(nn.Module):
    def __init__(self, cin, out_disp, channels=(64, 96, 128, 160)):
        super().__init__()
        c0, c1, c2, c3 = channels
        self.enc0 = ConvRelu(cin, c0)
        self.enc1 = ConvRelu(c0, c1, stride=2)
        self.enc1b = ConvRelu(c1, c1)
        self.enc2 = ConvRelu(c1, c2, stride=2)
        self.enc2b = ConvRelu(c2, c2)
        self.enc3 = ConvRelu(c2, c3, stride=2)
        self.enc3b = ConvRelu(c3, c3)
        self.dec2 = ConvRelu(c3 + c2, c2)
        self.dec1 = ConvRelu(c2 + c1, c1)
        self.dec0 = ConvRelu(c1 + c0, c0)
        self.cost_head = nn.Conv2d(c0, out_disp, 3, 1, 1)

    def forward(self, x):
        e0 = self.enc0(x)
        e1 = self.enc1b(self.enc1(e0))
        e2 = self.enc2b(self.enc2(e1))
        e3 = self.enc3b(self.enc3(e2))
        up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
        d2 = self.dec2(torch.cat([up(e3), e2], dim=1))
        d1 = self.dec1(torch.cat([up(d2), e1], dim=1))
        d0 = self.dec0(torch.cat([up(d1), e0], dim=1))
        return self.cost_head(d0)


def soft_argmin(cost: torch.Tensor) -> torch.Tensor:
    """(B, D, H, W) matching cost → (B, H, W) expected disparity."""
    weights = torch.softmax(-cost, dim=1)
    d = torch.arange(cost.shape[1], dtype=cost.dtype, device=cost.device)
    return (weights * d[None, :, None, None]).sum(dim=1)


def bilinear2x(x: torch.Tensor) -> torch.Tensor:
    return F.interpolate(
        x, scale_factor=2, mode="bilinear", align_corners=False
    )


class StereoNet(nn.Module):
    def __init__(self, max_disp=192, feat_stride=4, feat_channels=64):
        super().__init__()
        self.d_corr = max_disp // feat_stride
        self.feat_stride = feat_stride
        self.tower = FeatureTower(feat_channels)
        self.aggregation = CostAggregation(
            self.d_corr + feat_channels, self.d_corr
        )

    def forward(self, left, right):
        fl = self.tower(left)
        fr = self.tower(right)
        cost = correlation1d(fl, fr, self.d_corr)
        refined = self.aggregation(torch.cat([cost, fl], dim=1))
        disp_q = soft_argmin(refined) * float(self.feat_stride)
        disp = bilinear2x(bilinear2x(disp_q.unsqueeze(1)))
        return disp.squeeze(1)
