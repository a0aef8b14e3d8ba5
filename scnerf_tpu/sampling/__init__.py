from scnerf_tpu.sampling.searchsorted import searchsorted
from scnerf_tpu.sampling.stratified import stratified_z_vals, perturb_z_vals
from scnerf_tpu.sampling.pdf import sample_pdf
