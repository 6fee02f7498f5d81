from simple_pose_tpu.train.schedules import multistep_schedule, warmup_cosine_multistep_schedule
from simple_pose_tpu.train.ema import ema_update, ema_decay
from simple_pose_tpu.train.config import load_config, TrainConfig
