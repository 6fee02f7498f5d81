from simple_pose_tpu.ops.affine import (
    box_to_center_scale,
    center_scale_to_box,
    get_affine_transform,
    solve_affine,
    affine_transform_joints,
    flip_joints,
    box_jitter,
    invert_affine,
    compose_affine,
    hflip_affine,
)
