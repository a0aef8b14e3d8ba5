from scnerf_tpu.metrics.ssim import ssim
from scnerf_tpu.metrics.lpips import lpips, lpips_available, load_weights
