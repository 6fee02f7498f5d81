from simple_pose_tpu.utils.misc import rand_seed, AverageLogger
from simple_pose_tpu.utils.viz import draw_pose, draw_heat_map, BONES, BONE_COLORS, JOINT_COLORS
