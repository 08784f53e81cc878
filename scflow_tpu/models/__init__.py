from scflow_tpu.models.layers import ConvModule, InstanceNorm
from scflow_tpu.models.raft_encoder import RAFTEncoder
from scflow_tpu.models.motion import MotionEncoder, ConvGRU, XHead
from scflow_tpu.models.pose_head import SingleClassPoseHead, MultiClassPoseHead
from scflow_tpu.models.raft_decoder import RAFTDecoder, RAFTDecoderMask
from scflow_tpu.models.scflow_decoder import SCFlowDecoder
from scflow_tpu.models.densenet import DenseLayer, BasicDenseBlock
from scflow_tpu.models.resnet import ResNet, ResNetV1d

__all__ = [
    "ConvModule",
    "InstanceNorm",
    "RAFTEncoder",
    "MotionEncoder",
    "ConvGRU",
    "XHead",
    "SingleClassPoseHead",
    "MultiClassPoseHead",
    "RAFTDecoder",
    "RAFTDecoderMask",
    "SCFlowDecoder",
    "ResNet",
    "ResNetV1d",
    "DenseLayer",
    "BasicDenseBlock",
]
