from simple_pose_tpu.evalkit.export import (
    export_evaluator,
    export_fused,
    load_exported,
    save_exported,
    serving_fn,
)
from simple_pose_tpu.evalkit.fused import FusedDetectPose, fused_eval
from simple_pose_tpu.evalkit.workflows import (
    PoseEvaluator,
    predicts_by_gt,
    predicts_by_detections,
    rescore_and_filter,
    kps_to_dicts,
)
