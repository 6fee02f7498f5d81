from simple_pose_tpu.metrics.cocoeval import CocoKeypointsGT, KeypointEval, evaluate_map
from simple_pose_tpu.metrics.acc import heatmap_accuracy
