from scnerf_tpu.train.curriculum import Curriculum, mask_camera_grads, prd_active
from scnerf_tpu.train.optim import make_optimizer, noise_decay_mask, frozen_mask
from scnerf_tpu.train.step import (
    TrainConfig, TrainState, create_train_state, make_train_step,
)
from scnerf_tpu.train.nerfpp_step import NerfPPTrainConfig, make_nerfpp_train_step
from scnerf_tpu.train.checkpoint import (
    save_checkpoint, restore_checkpoint, list_checkpoint_steps,
    merge_states, restore_camera_partial,
)
