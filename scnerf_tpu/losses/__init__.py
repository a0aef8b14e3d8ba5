from scnerf_tpu.losses.photometric import img2mse, masked_mse, mse2psnr
from scnerf_tpu.losses.prd import prd_loss, prd_pointwise
from scnerf_tpu.losses.prd_eval import filter_matches_with_gt, prd_evaluation
