from scnerf_tpu.data.batching import RayPool, gather_target, sample_pixels
from scnerf_tpu.data.noise import NoiseConfig, inject_pose_noise
