from video_vae_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
from video_vae_tpu.train.setup import (  # noqa: F401
    create_optimizer,
    create_sharded_model,
    make_lr_schedule,
)
