"""Flax model zoo: ResNet backbones, deconv head, integral PoseNet.

Reference: ``common/nets/resnet.py`` (ResNetBackbone), ``main/model.py``
(HeadNet, ResPoseNet, get_pose_net).
"""

from ihpr_tpu.models.resnet import ResNetBackbone, RESNET_SPECS
from ihpr_tpu.models.head import DeconvHead
from ihpr_tpu.models.pose_net import PoseNet, build_pose_net

__all__ = [
    "ResNetBackbone",
    "RESNET_SPECS",
    "DeconvHead",
    "PoseNet",
    "build_pose_net",
]
