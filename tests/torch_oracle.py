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
            # reference ResLayer keeps bias=True on the projection conv
            # (resnet.py:728 with an unresolved TODO) — load-bearing for
            # checkpoint conversion
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=True), make_norm(norm, planes)
            )

    def forward(self, x):
        identity = x
        out = F.relu(getattr(self, f"{self._abbr}1")(self.conv1(x)))
        out = getattr(self, f"{self._abbr}2")(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class BottleneckTorch(nn.Module):
    """Reference Bottleneck (resnet.py:97-260), 'pytorch' style: stride on
    conv2, convs bias-free, expansion 4."""

    expansion = 4

    def __init__(self, cin, planes, stride, norm, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        abbr = {"BN": "bn", "IN": "in"}[norm]
        setattr(self, f"{abbr}1", make_norm(norm, planes))
        setattr(self, f"{abbr}2", make_norm(norm, planes))
        setattr(self, f"{abbr}3", make_norm(norm, planes * 4))
        self._abbr = abbr
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = F.relu(getattr(self, f"{self._abbr}1")(self.conv1(x)))
        out = F.relu(getattr(self, f"{self._abbr}2")(self.conv2(out)))
        out = getattr(self, f"{self._abbr}3")(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class ResNetTorch(nn.Module):
    """Reference full ResNet/ResNetV1d (resnet.py:306-773): stem (7x7 or
    deep 3x3 triple) + maxpool + 4 stages; avg_down pools before a stride-1
    projection conv; downsample projection keeps bias=True (ResLayer,
    resnet.py:728)."""

    _arch = {18: ("basic", (2, 2, 2, 2)), 34: ("basic", (3, 4, 6, 3)),
             50: ("bottleneck", (3, 4, 6, 3))}

    def __init__(self, depth=18, base_channels=64, norm="BN",
                 deep_stem=False, avg_down=False, num_stages=4,
                 strides=(1, 2, 2, 2), out_indices=(0, 1, 2, 3)):
        super().__init__()
        kind, stage_blocks = self._arch[depth]
        block = BasicBlock if kind == "basic" else BottleneckTorch
        expansion = 1 if kind == "basic" else 4
        self.deep_stem = deep_stem
        self.out_indices = out_indices
        stem = base_channels
        if deep_stem:
            half = stem // 2
            self.stem = nn.Sequential(
                nn.Conv2d(3, half, 3, 2, 1, bias=False), make_norm(norm, half),
                nn.ReLU(), nn.Conv2d(half, half, 3, 1, 1, bias=False),
                make_norm(norm, half), nn.ReLU(),
                nn.Conv2d(half, stem, 3, 1, 1, bias=False),
                make_norm(norm, stem), nn.ReLU(),
            )
        else:
            self.conv1 = nn.Conv2d(3, stem, 7, 2, 3, bias=False)
            setattr(self, {"BN": "bn", "IN": "in"}[norm] + "1",
                    make_norm(norm, stem))
            self._abbr = {"BN": "bn", "IN": "in"}[norm]
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = stem
        self.num_stages = num_stages
        for i, nb in enumerate(stage_blocks[:num_stages]):
            planes = base_channels * 2**i
            blocks = []
            for b in range(nb):
                s = strides[i] if b == 0 else 1
                ds = None
                if s != 1 or inplanes != planes * expansion:
                    seq = []
                    cs = s
                    if avg_down and s != 1:
                        seq.append(nn.AvgPool2d(s, s, ceil_mode=True,
                                                count_include_pad=False))
                        cs = 1
                    seq += [nn.Conv2d(inplanes, planes * expansion, 1, cs,
                                      bias=True),
                            make_norm(norm, planes * expansion)]
                    ds = nn.Sequential(*seq)
                if kind == "basic":
                    blk = BasicBlock(inplanes, planes, s, norm)
                    blk.downsample = ds
                else:
                    blk = BottleneckTorch(inplanes, planes, s, norm, ds)
                blocks.append(blk)
                inplanes = planes * expansion
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        if self.deep_stem:
            x = self.stem(x)
        else:
            x = F.relu(getattr(self, f"{self._abbr}1")(self.conv1(x)))
        x = self.maxpool(x)
        outs = []
        for i in range(self.num_stages):
            x = getattr(self, f"layer{i + 1}")(x)
            if i in self.out_indices:
                outs.append(x)
        return outs


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


def corr_pyramid_torch(feat1, feat2, num_levels=4):
    """Reference CorrelationPyramid (raft_decoder.py:19-58): all-pairs
    matmul / sqrt(C), then 2x2 avg-pool pyramid of (N*H*W, 1, Hl, Wl)."""
    N, C, H, W = feat1.shape
    corr = torch.matmul(
        feat1.view(N, C, -1).permute(0, 2, 1), feat2.view(N, C, -1)
    ).view(N * H * W, 1, H, W) / math.sqrt(C)
    pyr = [corr]
    for _ in range(num_levels - 1):
        pyr.append(F.avg_pool2d(pyr[-1], 2, 2))
    return pyr


def corr_lookup_torch(pyramid, flow, radius=4):
    """Reference CorrLookup (corr_lookup.py:102-136): window taps around
    coords+flow per level via grid_sample (bilinear, zeros padding,
    align_corners=True).  Tap-order quirk preserved: the FIRST window axis
    offsets x, the second offsets y (delta = stack(meshgrid(dy, dx)) added
    to an (x, y) grid)."""
    B, _, H, W = flow.shape
    dt = flow.dtype
    xx = torch.arange(W, dtype=dt)
    yy = torch.arange(H, dtype=dt)
    gy, gx = torch.meshgrid(yy, xx, indexing="ij")
    grid = torch.stack([gx, gy], dim=0)[None] + flow  # (B, 2, H, W), (x, y)
    grid = grid.permute(0, 2, 3, 1)
    k = 2 * radius + 1
    offs = torch.linspace(-radius, radius, k, dtype=dt)
    da, db = torch.meshgrid(offs, offs, indexing="ij")
    delta = torch.stack([da, db], dim=-1).view(1, k, k, 2)

    outs = []
    for lvl, corr in enumerate(pyramid):
        centroid = grid.reshape(B * H * W, 1, 1, 2) / 2**lvl
        coords = centroid + delta  # (..., (x, y))
        _, _, Hl, Wl = corr.shape
        norm = torch.stack(
            [2 * coords[..., 0] / (Wl - 1) - 1, 2 * coords[..., 1] / (Hl - 1) - 1],
            dim=-1,
        )
        samp = F.grid_sample(corr, norm, mode="bilinear",
                             padding_mode="zeros", align_corners=True)
        outs.append(samp.view(B, H, W, -1))
    return torch.cat(outs, dim=-1).permute(0, 3, 1, 2)


def ortho6d_to_matrix_torch(o6d):
    """Gram-Schmidt ortho6d -> R (reference pose.py:153-169)."""
    x = F.normalize(o6d[:, 0:3], p=2, dim=1)
    z = F.normalize(torch.cross(x, o6d[:, 3:6], dim=1), p=2, dim=1)
    y = torch.cross(z, x, dim=1)
    return torch.stack([x, y, z], dim=-1)


def apply_delta_pose_torch(d_rot6d, d_trans, R_src, t_src, weight=10.0,
                           depth_transform="exp", detach_depth_for_xy=False):
    """Reference get_pose_from_delta_pose (pose.py:124-149) incl. the
    detach_depth_for_xy stop-gradient on vz (pose.py:142-144)."""
    dR = ortho6d_to_matrix_torch(d_rot6d)
    R_dst = torch.bmm(dR, R_src)
    if depth_transform == "exp":
        vz = t_src[:, 2] / torch.exp(d_trans[:, 2])
    else:
        vz = t_src[:, 2] * (d_trans[:, 2] + 1)
    vz_xy = vz.detach() if detach_depth_for_xy else vz
    vx = vz_xy * (d_trans[:, 0] / weight + t_src[:, 0] / t_src[:, 2])
    vy = vz_xy * (d_trans[:, 1] / weight + t_src[:, 1] / t_src[:, 2])
    return R_dst, torch.stack([vx, vy, vz], dim=-1)


def cal_3d_2d_corr_torch(depth, K, R, t):
    """Reference cal_3d_2d_corr (pose.py:44-64): object-frame lift of the
    depth>0 pixels."""
    mask = depth > 0
    ys, xs = torch.nonzero(mask, as_tuple=True)
    d = depth[mask]
    homo = torch.stack([xs.to(d.dtype), ys.to(d.dtype), torch.ones_like(d)], -1)
    cam = torch.mm(torch.inverse(K), (homo * d[:, None]).t()).t()
    obj = torch.mm(torch.inverse(R), (cam - t[None]).t()).t()
    return torch.stack([xs.to(d.dtype), ys.to(d.dtype)], -1), obj


def flow_from_points_torch(R_dst, t_dst, K, p2d_list, p3d_list, H, W,
                           invalid_num=0.0):
    """Reference get_flow_from_delta_pose_and_points (pose.py:66-88):
    reproject + scatter per image."""
    n = len(p2d_list)
    flow = R_dst.new_ones((n, 2, H, W)) * invalid_num
    for i in range(n):
        p2d, p3d = p2d_list[i], p3d_list[i]
        proj = torch.mm(K[i], torch.mm(R_dst[i], p3d.t()) + t_dst[i][:, None]).t()
        fx = proj[:, 0] / proj[:, 2] - p2d[:, 0]
        fy = proj[:, 1] / proj[:, 2] - p2d[:, 1]
        yi = p2d[:, 1].long()
        xi = p2d[:, 0].long()
        flow[i, 0, yi, xi] = fx
        flow[i, 1, yi, xi] = fy
    return flow


class SCFlowDecoderTorch(nn.Module):
    """Reference SCFlowDecoder (scflow_decoder.py:18-251) with mmcv naming:
    encoder (motion), gru, flow_pred, mask_pred, pose_pred,
    delta_flow_encoder [2->128(7x7)->64(3x3)], mask_encoder
    [1->64->32 (3x3)]."""

    def __init__(self, num_class=3, num_levels=4, radius=4, iters=4,
                 feat_size=(8, 8), detach_flow=True, detach_mask=True,
                 detach_pose=True, detach_depth_for_xy=False):
        super().__init__()
        self.num_levels = num_levels
        self.radius = radius
        self.iters = iters
        self.detach_flow = detach_flow
        self.detach_mask = detach_mask
        self.detach_pose = detach_pose
        self.detach_depth_for_xy = detach_depth_for_xy
        self.encoder = MotionEncoderTorch(num_levels, radius)
        self.gru = ConvGRUTorch(128, 256)
        self.flow_pred = XHeadTorch(128, 256, 2, kind="flow")
        self.mask_pred = XHeadTorch(128, 256, 1, kind="mask")
        self.pose_pred = MultiClassPoseHeadTorch(num_class, 224, 6,
                                                 feat_size=feat_size)
        self.delta_flow_encoder = nn.Sequential(
            ConvModule(2, 128, 7, padding=3), ConvModule(128, 64, 3, padding=1)
        )
        self.mask_encoder = nn.Sequential(
            ConvModule(1, 64, 3, padding=1), ConvModule(64, 32, 3, padding=1)
        )

    def forward(self, feat_render, feat_real, h_feat, cxt_feat, ref_R, ref_t,
                depth, K, label, init_flow, invalid_flow_num=0.0):
        pyramid = corr_pyramid_torch(feat_render, feat_real, self.num_levels)
        scale = 2 ** (self.num_levels - 1)
        N, H, W = depth.shape
        p2d, p3d = [], []
        for i in range(N):
            a, b = cal_3d_2d_corr_torch(depth[i], K[i], ref_R[i], ref_t[i])
            p2d.append(a)
            p3d.append(b)
        R, t = ref_R, ref_t
        flow = init_flow
        mask = torch.ones((N, 1, H // scale, W // scale), dtype=init_flow.dtype)
        seqs = {k: [] for k in ("flow_from_pose", "flow_from_pred",
                                "rotations", "translations", "masks",
                                "delta_rotations", "delta_translations")}
        for _ in range(self.iters):
            # reference detach structure (scflow_decoder.py:192-195): the
            # pose-induced flow and the previous mask carry no gradient into
            # the next iteration
            if self.detach_flow:
                flow = flow.detach()
            if self.detach_mask:
                mask = mask.detach()
            flow_small = (1.0 / scale) * F.interpolate(
                flow, scale_factor=1.0 / scale, mode="bilinear",
                align_corners=True)
            corr = corr_lookup_torch(pyramid, flow_small, self.radius)
            motion_feat = self.encoder(corr, flow_small)
            h_feat = self.gru(h_feat, torch.cat([cxt_feat, motion_feat], 1))
            delta_flow = self.flow_pred(h_feat)
            mask = torch.sigmoid(self.mask_pred(h_feat))
            dff = self.delta_flow_encoder(delta_flow)
            mf = self.mask_encoder(mask)
            d_rot, d_trans = self.pose_pred(
                torch.cat([h_feat, dff, mf], dim=1), label)
            flow_pred = scale * F.interpolate(
                flow_small + delta_flow, scale_factor=scale, mode="bilinear",
                align_corners=True)
            up_mask = F.interpolate(mask, scale_factor=scale, mode="bilinear",
                                    align_corners=True)
            R, t = apply_delta_pose_torch(
                d_rot, d_trans,
                R.detach() if self.detach_pose else R,
                t.detach() if self.detach_pose else t,
                detach_depth_for_xy=self.detach_depth_for_xy)
            flow = flow_from_points_torch(R, t, K, p2d, p3d, H, W,
                                          invalid_flow_num)
            seqs["flow_from_pose"].append(flow)
            seqs["flow_from_pred"].append(flow_pred)
            seqs["rotations"].append(R)
            seqs["translations"].append(t)
            seqs["masks"].append(up_mask)
            seqs["delta_rotations"].append(d_rot)
            seqs["delta_translations"].append(d_trans)
        return {k: torch.stack(v, 0) for k, v in seqs.items()}


class SCFlowRefinerTorch(nn.Module):
    """Full reference SCFlowRefiner network (scflow_refiner.py:88-143):
    shared feature encoder + BN context encoder (tanh/relu split) + SCFlow
    decoder.  Module names match the reference checkpoint layout consumed by
    runtime/convert_torch.py."""

    def __init__(self, num_class=3, iters=4, feat_size=(8, 8), **decoder_kw):
        super().__init__()
        self.render_encoder = RAFTEncoderTorch(256, norm="IN")
        self.context = RAFTEncoderTorch(256, norm="BN")
        self.decoder = SCFlowDecoderTorch(num_class=num_class, iters=iters,
                                          feat_size=feat_size, **decoder_kw)

    def forward(self, render_images, real_images, ref_R, ref_t, depth, K,
                label):
        feat_render = self.render_encoder(render_images)
        feat_real = self.render_encoder(real_images)
        cxt = self.context(render_images)
        h_feat = torch.tanh(cxt[:, :128])
        cxt_feat = torch.relu(cxt[:, 128:])
        N, _, H, W = real_images.shape
        init_flow = torch.zeros((N, 2, H, W), dtype=real_images.dtype)
        return self.decoder(feat_render, feat_real, h_feat, cxt_feat, ref_R,
                            ref_t, depth, K, label, init_flow)


class MultiClassPoseHeadTorch(nn.Module):
    def __init__(self, num_class=21, cin=224, rot_dim=6, feat_size=(32, 32)):
        super().__init__()
        self.num_class = num_class
        self.rot_dim = rot_dim
        convs = []
        for _ in range(3):
            convs.append(ConvModule(cin, 128, 3, stride=2, padding=1, norm="GN"))
            cin = 128
        self.conv_layers = nn.Sequential(*convs)
        # fc input = 128 * feat_size/8^2 (reference pose_head.py:146-168
        # conv_out_size accounting; feat_size is the head INPUT spatial size)
        fc_in = 128 * (feat_size[0] // 8) * (feat_size[1] // 8)
        self.fc_layers = nn.Sequential(
            nn.Sequential(nn.Linear(fc_in, 1024), nn.ReLU()),
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


def convex_upsample_torch(x, mask, scale=8, multiplier=None):
    """Reference learned convex upsampling (raft_decoder.py:392-412):
    softmax over the 9 grid taps, unfold 3x3, per-subpixel blend."""
    if multiplier is None:
        multiplier = float(scale)
    n, c, h, w = x.shape
    m = mask.view(n, 1, 9, scale, scale, h, w)
    m = torch.softmax(m, dim=2)
    up = F.unfold(multiplier * x, [3, 3], padding=1).view(
        n, c, 9, 1, 1, h, w)
    up = torch.sum(m * up, dim=2).permute(0, 1, 4, 2, 5, 3)
    return up.reshape(n, c, scale * h, scale * w)


class RAFTDecoderTorch(nn.Module):
    """Reference RAFTDecoder/RAFTDecoderMask forward (raft_decoder.py:299-456,
    raft_decoder_mask.py:21-208): per iteration detach flow -> corr lookup ->
    motion encoder -> GRU -> delta flow; convex-upsample each iteration's
    flow (x8) and sigmoid occlusion (x1) with the shared learned mask.
    mmcv naming: encoder, gru, flow_pred, mask_pred, occlusion_pred."""

    def __init__(self, num_levels=4, radius=4, iters=3,
                 predict_occlusion=True, mask_channels=64):
        super().__init__()
        self.num_levels = num_levels
        self.radius = radius
        self.iters = iters
        self.predict_occlusion = predict_occlusion
        self.encoder = MotionEncoderTorch(num_levels, radius)
        self.gru = ConvGRUTorch()
        self.flow_pred = XHeadTorch(128, 256, 2, kind="flow")
        self.mask_pred = XHeadTorch(
            128, 256, mask_channels * (2 * radius + 1), kind="mask")
        if predict_occlusion:
            self.occlusion_pred = XHeadTorch(128, 256, 1, kind="mask")

    def forward(self, feat1, feat2, flow, h, cxt):
        pyramid = corr_pyramid_torch(feat1, feat2, self.num_levels)
        upflows, upoccs = [], []
        for _ in range(self.iters):
            flow = flow.detach()
            corr = corr_lookup_torch(pyramid, flow, self.radius)
            mfeat = self.encoder(corr, flow)
            x = torch.cat([cxt, mfeat], dim=1)
            h = self.gru(h, x)
            delta = self.flow_pred(h)
            flow = flow + delta
            mask = 0.25 * self.mask_pred(h)
            upflows.append(convex_upsample_torch(flow, mask, 8, multiplier=8.0))
            if self.predict_occlusion:
                occ = torch.sigmoid(self.occlusion_pred(h))
                upoccs.append(
                    convex_upsample_torch(occ, mask, 8, multiplier=1.0))
        out = {"flow": torch.stack(upflows, dim=0)}
        if self.predict_occlusion:
            out["occlusion"] = torch.stack(upoccs, dim=0)[:, :, 0]
        return out


class RAFTRefinerFlowMaskTorch(nn.Module):
    """Full reference RAFTRefinerFlowMask network (raft_refiner_flow.py +
    raft_refiner_flow_mask.py network part): shared IN feature encoder + BN
    context encoder (tanh/relu split) + RAFT decoder.  Module names match
    the checkpoint layout consumed by runtime/convert_torch.py."""

    def __init__(self, iters=3, predict_occlusion=True):
        super().__init__()
        self.render_encoder = RAFTEncoderTorch(256, norm="IN")
        self.context = RAFTEncoderTorch(256, norm="BN")
        self.decoder = RAFTDecoderTorch(
            iters=iters, predict_occlusion=predict_occlusion)

    def forward(self, render_images, real_images):
        feat_render = self.render_encoder(render_images)
        feat_real = self.render_encoder(real_images)
        cxt = self.context(render_images)
        h = torch.tanh(cxt[:, :128])
        cxt_feat = torch.relu(cxt[:, 128:])
        n, _, hf, wf = feat_real.shape
        flow0 = torch.zeros((n, 2, hf, wf), dtype=feat_real.dtype)
        return self.decoder(feat_render, feat_real, flow0, h, cxt_feat)


# ---------------------------------------------------------------------------
# Loss oracles (reference models/loss/) — used by the gradient-parity tests:
# fp64 torch backward vs jax.grad of the jitted loss.
# ---------------------------------------------------------------------------


def raft_loss_torch(pred_flow, gt_flow, valid=None, max_flow=400.0,
                    loss_weight=1.0, eps=1e-10):
    """Reference RAFTLoss (sequence_loss.py:9-24): masked L1, NCHW flows."""
    mag = torch.sum(gt_flow**2, dim=1).sqrt()
    if valid is None:
        v = (mag < max_flow).to(gt_flow)
    else:
        v = ((valid >= 0.5) & (mag < max_flow)).to(gt_flow)
    loss = (pred_flow - gt_flow).abs()
    return loss_weight * (v[:, None] * loss).sum() / (v.sum() + eps)


def l1_loss_torch(pred, gt, loss_weight=1.0):
    """Reference L1Loss (sequence_loss.py:29-37): UNMASKED mean — the
    reference ignores `valid` (SURVEY.md §2.4 item 8)."""
    return loss_weight * torch.mean(torch.abs(pred - gt))


def disentangle_pm_loss_torch(pred_r, pred_t, gt_r, gt_t, labels, meshes,
                              diameters, sym_classes, loss_type=1,
                              disentangle_z=True, loss_weight=1.0):
    """Reference DisentanglePointMatchingLoss (point_matching_loss.py:160-218)
    with the per-image python loop and brute-force NN (= knn_points K=1) for
    symmetric classes.  meshes: list of (Vi, 3) tensors per class;
    sym_classes: set of 0-based class ids."""
    loss = 0.0
    n = len(pred_r)
    for i in range(n):
        li = int(labels[i])
        pts = meshes[li]
        gt_rot = torch.matmul(gt_r[i], pts.t()).t()
        gt_rt = gt_rot + gt_t[i][None]
        pred_rot = torch.matmul(pred_r[i], pts.t()).t() + gt_t[i][None]
        if li in sym_classes:
            idx = torch.cdist(gt_rt, pred_rot).argmin(dim=1)
            pred_rot = pred_rot[idx]
        loss_rot = torch.linalg.norm(
            pred_rot - gt_rt, dim=-1, ord=loss_type).mean()
        if disentangle_z:
            tz = gt_t[i].clone()
            tz[-1] = pred_t[i, -1]
            loss_z = torch.linalg.norm(
                gt_rot + tz[None] - gt_rt, dim=-1, ord=loss_type).mean()
            txy = pred_t[i].clone()
            txy[-1] = gt_t[i, -1]
            loss_xy = torch.linalg.norm(
                gt_rot + txy[None] - gt_rt, dim=-1, ord=loss_type).mean()
            loss_trans = loss_z + loss_xy
        else:
            loss_trans = torch.linalg.norm(
                gt_rot + pred_t[i][None] - gt_rt, dim=-1,
                ord=loss_type).mean()
        loss = loss + (loss_rot + loss_trans) / diameters[li]
    return loss_weight * loss / n


def scflow_loss_torch(out, gt_r, gt_t, gt_flow, rendered_masks, labels,
                      meshes, diameters, sym_classes, gamma=0.8,
                      pose_weight=10.0, flow_weight=0.1, mask_weight=10.0,
                      max_flow=400.0):
    """The reference 3-term gamma-weighted sequence loss
    (scflow_refiner.py:212-247 + sequence_loss.py:42-82).  gt_flow NCHW;
    the occlusion target uses the SIGNED component sum exactly like the
    reference (scflow_refiner.py:230)."""
    T = out["rotations"].shape[0]
    gt_occ = (torch.sum(gt_flow, dim=1) < max_flow).to(gt_flow.dtype)
    total = 0.0
    for i in range(T):
        w = gamma ** (T - 1 - i)
        lp = disentangle_pm_loss_torch(
            out["rotations"][i], out["translations"][i], gt_r, gt_t, labels,
            meshes, diameters, sym_classes, loss_type=1, disentangle_z=True,
            loss_weight=pose_weight)
        lf = raft_loss_torch(out["flow_from_pred"][i], gt_flow,
                             valid=rendered_masks, max_flow=max_flow,
                             loss_weight=flow_weight)
        lm = l1_loss_torch(out["masks"][i][:, 0], gt_occ,
                           loss_weight=mask_weight)
        total = total + w * (lp + lf + lm)
    return total


def raft_seq_loss_torch(out, gt_flow, rendered_masks, gamma=0.8,
                        flow_weight=1.0, occlusion_weight=100.0,
                        max_flow=400.0):
    """RAFT-family sequence loss (raft_refiner_flow_mask.py:169-222):
    gamma-weighted RAFT flow loss + unmasked occlusion L1."""
    T = out["flow"].shape[0]
    gt_occ = (torch.sum(gt_flow, dim=1) < max_flow).to(gt_flow.dtype)
    total = 0.0
    for i in range(T):
        w = gamma ** (T - 1 - i)
        lf = raft_loss_torch(out["flow"][i], gt_flow, valid=rendered_masks,
                             max_flow=max_flow, loss_weight=flow_weight)
        total = total + w * lf
        if "occlusion" in out:
            lo = l1_loss_torch(out["occlusion"][i], gt_occ,
                               loss_weight=occlusion_weight)
            total = total + w * lo
    return total
