"""Reference state-dict manifests: the EXACT torch key -> shape tables the
reference models serialize, transcribed from `/root/reference/models/`
module definitions (NOT generated from this repo's converter mapping — the
two derivations are independent, so agreement is a real cross-check).

Purpose (MIGRATION.md "State-dict manifest"): no real reference `.pth` is
available in this environment, so checkpoint-conversion fidelity can only
be proven structurally.  `verify_state_dict` checks a loaded state dict
against the manifest BEFORE conversion and fails with a named key diff —
the first real checkpoint either converts cleanly or says exactly which
keys are missing / unexpected / mis-shaped.

Naming rules transcribed from the reference architecture:
- mmcv ConvModule serializes `*.conv.weight[, .conv.bias]` plus the norm
  under its abbreviation (`bn`/`gn`); conv bias exists iff no norm is
  configured (bias='auto').
- torch InstanceNorm2d (norm_cfg type 'IN') has affine=False and no
  running stats => contributes ZERO keys (reference encoder config,
  configs/refine_models/scflow.py:23-35).
- BatchNorm2d contributes weight/bias/running_mean/running_var and the
  0-dim `num_batches_tracked`.
- `build_norm_layer(cfg, ch, postfix)` attribute name = abbr + postfix
  ('bn1', 'in1', ...), so IN encoders simply omit those keys.
- RAFTEncoder (models/encoder/raft_encoder.py:55-220): `conv1` 7x7/2 stem
  (bias=True), norm1, three `res_layer{i}` of two BasicBlocks
  (models/backbone/resnet.py:14-96: conv1/conv2 3x3 bias=True, norm1/2,
  optional `downsample.0` 1x1 conv bias=True + `downsample.1` norm,
  ResLayer, resnet.py:678-731), `conv2` 1x1 out (bias=True).
- MotionEncoder (models/decoder/raft_decoder.py:61-166): corr_net /
  flow_net / out_net Sequentials of norm-free ConvModules.
- ConvGRU SeqConv (raft_decoder.py:168-253): conv_z/r/q ModuleLists of two
  norm-free ConvModules with (1,5)/(5,1) kernels, x_channels = 126+2+128.
- XHead (raft_decoder.py:256-294): `layers.{i}.conv` + `predict_layer`
  (3x3 for flow, 1x1 for mask).
- MultiClassPoseHead (models/head/pose_head.py:111-198): three stride-2
  GN32 ConvModules (no conv bias), `fc_layers.{i}.0` Linears, and
  `rotation_pred`/`translation_pred` Linears sized 6*C / 3*C.
- SCFlowRefiner with seperate_encoder=False registers ONE encoder module
  under BOTH `render_encoder.` and `real_encoder.` (base_refiner.py:36-39),
  and torch state_dict serializes both attribute paths.
"""

from typing import Dict, Iterable, Optional, Tuple

import numpy as np

Shape = Tuple[int, ...]
Manifest = Dict[str, Shape]


def _conv(out: Manifest, prefix: str, cout: int, cin: int, kh: int, kw: int,
          bias: bool = True):
    out[f"{prefix}.weight"] = (cout, cin, kh, kw)
    if bias:
        out[f"{prefix}.bias"] = (cout,)


def _bn(out: Manifest, prefix: str, ch: int):
    out[f"{prefix}.weight"] = (ch,)
    out[f"{prefix}.bias"] = (ch,)
    out[f"{prefix}.running_mean"] = (ch,)
    out[f"{prefix}.running_var"] = (ch,)
    out[f"{prefix}.num_batches_tracked"] = ()


def _gn(out: Manifest, prefix: str, ch: int):
    out[f"{prefix}.weight"] = (ch,)
    out[f"{prefix}.bias"] = (ch,)


def _linear(out: Manifest, prefix: str, cout: int, cin: int):
    out[f"{prefix}.weight"] = (cout, cin)
    out[f"{prefix}.bias"] = (cout,)


def raft_encoder_manifest(prefix: str, norm: str = "IN",
                          in_channels: int = 3,
                          out_channels: int = 256) -> Manifest:
    """RAFTEncoder net_type='Basic': stem 64, stages (64, 96, 128) strides
    (1, 2, 2), two BasicBlocks per stage (raft_encoder.py:55-67)."""
    assert norm in ("IN", "BN")
    m: Manifest = {}
    stem = 64
    _conv(m, f"{prefix}.conv1", stem, in_channels, 7, 7)
    if norm == "BN":
        _bn(m, f"{prefix}.bn1", stem)
    inplanes = stem
    for stage, (planes, stride) in enumerate(
            zip((64, 96, 128), (1, 2, 2)), start=1):
        for block in range(2):
            bp = f"{prefix}.res_layer{stage}.{block}"
            cin = inplanes if block == 0 else planes
            _conv(m, f"{bp}.conv1", planes, cin, 3, 3)
            _conv(m, f"{bp}.conv2", planes, planes, 3, 3)
            if norm == "BN":
                _bn(m, f"{bp}.bn1", planes)
                _bn(m, f"{bp}.bn2", planes)
            # downsample on the first block when shape changes
            # (ResLayer, resnet.py:709-731; bias=True per :728)
            if block == 0 and (stride != 1 or inplanes != planes):
                _conv(m, f"{bp}.downsample.0", planes, inplanes, 1, 1)
                if norm == "BN":
                    _bn(m, f"{bp}.downsample.1", planes)
        inplanes = planes
    _conv(m, f"{prefix}.conv2", out_channels, inplanes, 1, 1)
    return m


def motion_encoder_manifest(prefix: str, num_levels: int = 4,
                            radius: int = 4) -> Manifest:
    """MotionEncoder net_type='Basic' (raft_decoder.py:75-133)."""
    m: Manifest = {}
    corr_in = num_levels * (2 * radius + 1) ** 2  # 324
    _conv(m, f"{prefix}.corr_net.0.conv", 256, corr_in, 1, 1)
    _conv(m, f"{prefix}.corr_net.1.conv", 192, 256, 3, 3)
    _conv(m, f"{prefix}.flow_net.0.conv", 128, 2, 7, 7)
    _conv(m, f"{prefix}.flow_net.1.conv", 64, 128, 3, 3)
    _conv(m, f"{prefix}.out_net.0.conv", 126, 192 + 64, 3, 3)
    return m


def conv_gru_manifest(prefix: str, h_channels: int = 128,
                      x_channels: int = 256) -> Manifest:
    """ConvGRU net_type='SeqConv' (raft_decoder.py:168-226)."""
    m: Manifest = {}
    cin = h_channels + x_channels
    for gate in ("z", "r", "q"):
        _conv(m, f"{prefix}.conv_{gate}.0.conv", h_channels, cin, 1, 5)
        _conv(m, f"{prefix}.conv_{gate}.1.conv", h_channels, cin, 5, 1)
    return m


def xhead_manifest(prefix: str, in_channels: int, feat_channels: Iterable[int],
                   x_channels: int, kind: str) -> Manifest:
    """XHead (raft_decoder.py:256-294): 3x3 predict for flow, 1x1 for mask."""
    m: Manifest = {}
    cin = in_channels
    feat_channels = tuple(feat_channels)
    for i, ch in enumerate(feat_channels):
        _conv(m, f"{prefix}.layers.{i}.conv", ch, cin, 3, 3)
        cin = ch
    k = 3 if kind == "flow" else 1
    _conv(m, f"{prefix}.predict_layer", x_channels, feat_channels[-1], k, k)
    return m


def pose_head_manifest(prefix: str, num_class: int, in_channels: int,
                       rotation_mode: str = "ortho6d",
                       feat_size: Tuple[int, int] = (32, 32),
                       multi_class: bool = True) -> Manifest:
    """MultiClass/SingleClassPoseHead net_type='Basic'
    (pose_head.py:12-198): convs [128,128,128] stride 2 GN32 (no conv
    bias), FCs [1024, 256], rotation/translation Linears."""
    m: Manifest = {}
    cin = in_channels
    spatial = feat_size[0] * feat_size[1]
    for i, ch in enumerate((128, 128, 128)):
        _conv(m, f"{prefix}.conv_layers.{i}.conv", ch, cin, 3, 3, bias=False)
        _gn(m, f"{prefix}.conv_layers.{i}.gn", ch)
        cin = ch
        spatial //= 4
    fc_in = cin * spatial
    for i, ch in enumerate((1024, 256)):
        _linear(m, f"{prefix}.fc_layers.{i}.0", ch, fc_in)
        fc_in = ch
    rot = {"ortho6d": 6, "quaternion": 4}[rotation_mode]
    mult = num_class if multi_class else 1
    _linear(m, f"{prefix}.rotation_pred", rot * mult, fc_in)
    _linear(m, f"{prefix}.translation_pred", 3 * mult, fc_in)
    return m


def scflow_refiner_manifest(num_class: int = 21,
                            rotation_mode: str = "ortho6d",
                            pose_in_channels: int = 224,
                            feat_size: Tuple[int, int] = (32, 32),
                            shared_encoder: bool = True,
                            multi_class_head: bool = True) -> Manifest:
    """The flagship config (configs/refine_models/scflow.py:17-115):
    shared IN feature encoder, BN context encoder, SCFlowDecoder with
    MultiClassPoseHead(21, 224, ortho6d)."""
    m: Manifest = {}
    m.update(raft_encoder_manifest("render_encoder", "IN"))
    m.update(raft_encoder_manifest("real_encoder", "IN"))
    # seperate_encoder=True checkpoints serialize the same key set (two
    # independent weight sets under the same two prefixes)
    del shared_encoder
    m.update(raft_encoder_manifest("context", "BN"))
    d = "decoder"
    m.update(motion_encoder_manifest(f"{d}.encoder"))
    m.update(conv_gru_manifest(f"{d}.gru"))
    m.update(xhead_manifest(f"{d}.flow_pred", 128, (256,), 2, "flow"))
    m.update(xhead_manifest(f"{d}.mask_pred", 128, (256,), 1, "mask"))
    m.update(pose_head_manifest(
        f"{d}.pose_pred", num_class, pose_in_channels, rotation_mode,
        feat_size, multi_class_head,
    ))
    # delta-flow / mask feature encoders (scflow_decoder.py:102-105)
    _conv(m, f"{d}.delta_flow_encoder.0.conv", 128, 2, 7, 7)
    _conv(m, f"{d}.delta_flow_encoder.1.conv", 64, 128, 3, 3)
    _conv(m, f"{d}.mask_encoder.0.conv", 64, 1, 3, 3)
    _conv(m, f"{d}.mask_encoder.1.conv", 32, 64, 3, 3)
    return m


def raft_refiner_manifest(predict_occlusion: bool = True,
                          convex_upsample: bool = True) -> Manifest:
    """RAFTRefinerFlow(Mask) with RAFTDecoder(Mask) net_type='Basic'
    (configs/refine_models/raft.py:4-48, raft_decoder.py:299-380,
    raft_decoder_mask.py:21-97): flow head, 576-channel convex-upsample
    mask head, and (Mask variant) the occlusion head."""
    m: Manifest = {}
    m.update(raft_encoder_manifest("render_encoder", "IN"))
    m.update(raft_encoder_manifest("real_encoder", "IN"))
    m.update(raft_encoder_manifest("context", "BN"))
    d = "decoder"
    m.update(motion_encoder_manifest(f"{d}.encoder"))
    m.update(conv_gru_manifest(f"{d}.gru"))
    m.update(xhead_manifest(f"{d}.flow_pred", 128, (256,), 2, "flow"))
    if predict_occlusion:
        m.update(xhead_manifest(f"{d}.occlusion_pred", 128, (256,), 1,
                                "mask"))
    if convex_upsample:
        # mask_channels = 64 * (2*radius+1) = 576 (raft_decoder.py:58-78)
        m.update(xhead_manifest(f"{d}.mask_pred", 128, (256,), 576, "mask"))
    return m


def mmflow_raft_manifest() -> Manifest:
    """The mmflow RAFT init checkpoint's ENCODER surface — the part the
    reference's converter duplicates into real/render_encoder and the part
    our models consume (tools/mmflow_ckpt_converter.py:29-41).  The mmflow
    decoder keys ('decoder.*') ride along and are matched only where names
    coincide with ours; they are NOT part of this guarantee."""
    m: Manifest = {}
    m.update(raft_encoder_manifest("encoder", "IN"))
    m.update(raft_encoder_manifest("cxt_encoder", "BN"))
    return m


MANIFESTS = {
    "scflow": scflow_refiner_manifest,
    "raft": raft_refiner_manifest,
    "mmflow_raft": mmflow_raft_manifest,
}


def manifest_for_config(model_cfg: dict) -> Optional[Manifest]:
    """Resolve the manifest from a parsed model config, honoring the keys
    that change the serialized shape set."""
    mtype = model_cfg.get("type")
    if mtype == "SCFlowRefiner":
        head = dict(model_cfg.get("decoder", {}).get("pose_head_cfg", {}))
        return scflow_refiner_manifest(
            num_class=head.get("num_class", 21),
            rotation_mode=head.get("rotation_mode", "ortho6d"),
            pose_in_channels=head.get("in_channels", 224),
            multi_class_head=head.get("type", "MultiClassPoseHead")
            == "MultiClassPoseHead",
        )
    if mtype in ("RAFTRefinerFlow", "RAFTRefinerFlowMask"):
        return raft_refiner_manifest(
            predict_occlusion=model_cfg.get("decoder", {}).get("type")
            == "RAFTDecoderMask",
        )
    return None


def verify_state_dict(sd: Dict[str, np.ndarray], manifest: Manifest,
                      ignore_suffixes: Tuple[str, ...] = (
                          "num_batches_tracked",),
                      allow_unexpected_prefixes: Tuple[str, ...] = (),
                      strict_unexpected: bool = True) -> Dict[str, list]:
    """Diff a loaded torch state dict against a manifest.

    Returns {'missing': [...], 'unexpected': [...], 'mismatched':
    [(key, got, want), ...]} and raises ValueError naming every diff when
    any missing/mismatched key exists (or unexpected, if
    strict_unexpected).  `ignore_suffixes` keys are optional on the sd
    side (older torch versions omit num_batches_tracked)."""
    missing, unexpected, mismatched = [], [], []
    for key, want in manifest.items():
        if key not in sd:
            if not key.endswith(ignore_suffixes):
                missing.append(key)
            continue
        got = tuple(np.asarray(sd[key]).shape)
        if got != tuple(want) and not key.endswith(ignore_suffixes):
            mismatched.append((key, got, want))
    for key in sd:
        if key in manifest:
            continue
        if key.startswith(allow_unexpected_prefixes) and \
                allow_unexpected_prefixes:
            continue
        unexpected.append(key)
    report = {"missing": sorted(missing), "unexpected": sorted(unexpected),
              "mismatched": sorted(mismatched)}
    bad = missing or mismatched or (unexpected and strict_unexpected)
    if bad:
        lines = ["state dict does not match the reference manifest:"]
        for k in report["missing"][:20]:
            lines.append(f"  missing   {k}  (want shape {manifest[k]})")
        for k, got, want in report["mismatched"][:20]:
            lines.append(f"  shape     {k}: checkpoint {got} != manifest {want}")
        for k in report["unexpected"][:20]:
            lines.append(f"  unexpected {k}")
        total = (len(report["missing"]) + len(report["mismatched"])
                 + len(report["unexpected"]))
        if total > 60:
            lines.append(f"  ... ({total} total diffs)")
        raise ValueError("\n".join(lines))
    return report


def synthetic_state_dict(manifest: Manifest, seed: int = 0
                         ) -> Dict[str, np.ndarray]:
    """A state dict with exactly the manifest's keys/shapes (random values)
    — what a real reference checkpoint looks like structurally."""
    rng = np.random.default_rng(seed)
    out = {}
    for k, shape in manifest.items():
        if k.endswith("num_batches_tracked"):
            out[k] = np.asarray(0, np.int64)
        else:
            out[k] = rng.normal(size=shape).astype(np.float32) * 0.05
    return out
