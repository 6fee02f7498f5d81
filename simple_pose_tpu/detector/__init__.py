from simple_pose_tpu.detector.yolov5 import YOLOv5
from simple_pose_tpu.detector.yolov4 import YOLOv4
from simple_pose_tpu.detector.nms import non_max_suppression_jit
from simple_pose_tpu.detector.wrapper import YOLOv5Detector
