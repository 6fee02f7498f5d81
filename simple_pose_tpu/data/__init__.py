from simple_pose_tpu.data.coco import PoseRecord, load_coco_keypoints, JOINT_PAIRS
from simple_pose_tpu.data.pipeline import PosePipeline, DetBoxPipeline
