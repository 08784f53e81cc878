"""Torch oracle of the reference network modules with mmcv state-dict
naming — used to validate checkpoint conversion + layer parity.  These
re-derive the reference architecture (models/encoder/raft_encoder.py,
models/decoder/raft_decoder.py, models/head/pose_head.py) in plain torch."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def make_norm(kind, ch):
    if kind == "BN":
        return nn.BatchNorm2d(ch)
    if kind == "IN":
        return nn.InstanceNorm2d(ch)
    if kind == "GN":
        return nn.GroupNorm(32, ch)
    return nn.Identity()


class ConvModule(nn.Module):
    """mmcv ConvModule naming: .conv, .bn/.gn, act."""

    def __init__(self, cin, cout, k, stride=1, padding=0, norm=None, act="relu"):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, padding, bias=norm is None)
        if norm == "BN":
            self.bn = nn.BatchNorm2d(cout)
        elif norm == "GN":
            self.gn = nn.GroupNorm(32, cout)
        self.norm_kind = norm
        self.act = act

    def forward(self, x):
        x = self.conv(x)
        if self.norm_kind == "BN":
            x = self.bn(x)
        elif self.norm_kind == "GN":
            x = self.gn(x)
        if self.act == "relu":
            x = F.relu(x)
        elif self.act == "sigmoid":
            x = torch.sigmoid(x)
        elif self.act == "tanh":
            x = torch.tanh(x)
        return x


class BasicBlock(nn.Module):
    def __init__(self, cin, planes, stride, norm):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=True)
        abbr = {"BN": "bn", "IN": "in"}[norm]
        setattr(self, f"{abbr}1", make_norm(norm, planes))
        setattr(self, f"{abbr}2", make_norm(norm, planes))
        self._abbr = abbr
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=False), make_norm(norm, planes)
            )

    def forward(self, x):
        identity = x
        out = F.relu(getattr(self, f"{self._abbr}1")(self.conv1(x)))
        out = getattr(self, f"{self._abbr}2")(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class RAFTEncoderTorch(nn.Module):
    def __init__(self, out_channels=256, norm="IN"):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=True)
        abbr = {"BN": "bn", "IN": "in"}[norm]
        setattr(self, f"{abbr}1", make_norm(norm, 64))
        self._abbr = abbr
        chans, strides = (64, 96, 128), (1, 2, 2)
        cin = 64
        for i, (planes, s) in enumerate(zip(chans, strides)):
            blocks = nn.Sequential(
                BasicBlock(cin, planes, s, norm), BasicBlock(planes, planes, 1, norm)
            )
            setattr(self, f"res_layer{i + 1}", blocks)
            cin = planes
        self.conv2 = nn.Conv2d(128, out_channels, 1, bias=True)

    def forward(self, x):
        x = F.relu(getattr(self, f"{self._abbr}1")(self.conv1(x)))
        for i in range(3):
            x = getattr(self, f"res_layer{i + 1}")(x)
        return self.conv2(x)


class MotionEncoderTorch(nn.Module):
    def __init__(self, num_levels=4, radius=4):
        super().__init__()
        cin = num_levels * (2 * radius + 1) ** 2
        self.corr_net = nn.Sequential(
            ConvModule(cin, 256, 1, padding=0), ConvModule(256, 192, 3, padding=1)
        )
        self.flow_net = nn.Sequential(
            ConvModule(2, 128, 7, padding=3), ConvModule(128, 64, 3, padding=1)
        )
        self.out_net = nn.Sequential(ConvModule(256, 126, 3, padding=1))

    def forward(self, corr, flow):
        c = self.corr_net(corr)
        f = self.flow_net(flow)
        out = self.out_net(torch.cat([c, f], dim=1))
        return torch.cat([out, flow], dim=1)


class ConvGRUTorch(nn.Module):
    def __init__(self, h_channels=128, x_channels=256):
        super().__init__()
        cin = h_channels + x_channels
        ks = [(1, 5), (5, 1)]
        ps = [(0, 2), (2, 0)]
        self.conv_z = nn.ModuleList(
            [ConvModule(cin, h_channels, k, padding=p, act="sigmoid") for k, p in zip(ks, ps)]
        )
        self.conv_r = nn.ModuleList(
            [ConvModule(cin, h_channels, k, padding=p, act="sigmoid") for k, p in zip(ks, ps)]
        )
        self.conv_q = nn.ModuleList(
            [ConvModule(cin, h_channels, k, padding=p, act="tanh") for k, p in zip(ks, ps)]
        )

    def forward(self, h, x):
        for cz, cr, cq in zip(self.conv_z, self.conv_r, self.conv_q):
            hx = torch.cat([h, x], dim=1)
            z, r = cz(hx), cr(hx)
            q = cq(torch.cat([r * h, x], dim=1))
            h = (1 - z) * h + z * q
        return h


class XHeadTorch(nn.Module):
    def __init__(self, cin=128, feat=256, cout=2, kind="flow"):
        super().__init__()
        self.layers = nn.Sequential(ConvModule(cin, feat, 3, padding=1))
        if kind == "flow":
            self.predict_layer = nn.Conv2d(feat, cout, 3, padding=1)
        else:
            self.predict_layer = nn.Conv2d(feat, cout, 1)

    def forward(self, x):
        return self.predict_layer(self.layers(x))


class MultiClassPoseHeadTorch(nn.Module):
    def __init__(self, num_class=21, cin=224, rot_dim=6):
        super().__init__()
        self.num_class = num_class
        self.rot_dim = rot_dim
        convs = []
        for _ in range(3):
            convs.append(ConvModule(cin, 128, 3, stride=2, padding=1, norm="GN"))
            cin = 128
        self.conv_layers = nn.Sequential(*convs)
        self.fc_layers = nn.Sequential(
            nn.Sequential(nn.Linear(128 * 16, 1024), nn.ReLU()),
            nn.Sequential(nn.Linear(1024, 256), nn.ReLU()),
        )
        self.rotation_pred = nn.Linear(256, rot_dim * num_class)
        self.translation_pred = nn.Linear(256, 3 * num_class)

    def forward(self, x, label):
        x = self.conv_layers(x)
        x = x.flatten(1)
        x = self.fc_layers(x)
        rot = self.rotation_pred(x).view(-1, self.num_class, self.rot_dim)
        trans = self.translation_pred(x).view(-1, self.num_class, 3)
        idx = label.long()
        rot = rot[torch.arange(len(idx)), idx]
        trans = trans[torch.arange(len(idx)), idx]
        return rot, trans
