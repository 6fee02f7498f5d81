from simple_pose_tpu.models.registry import build_model, build_from_cfg
from simple_pose_tpu.models.resnet import PoseResNet, build_resnet, RESNET_SPECS
from simple_pose_tpu.models.hrnet import PoseHRNet, build_hrnet
