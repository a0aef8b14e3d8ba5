from scnerf_tpu.fields.encoding import EncodingConfig, positional_encoding
from scnerf_tpu.fields.nerf import (
    NeRFConfig, init_nerf_mlp, nerf_mlp_apply, query_field, query_field_chunked,
)
from scnerf_tpu.fields.nerfpp import (
    NerfPPConfig, init_nerfpp_net, nerfpp_forward, mlpnet_apply, autoexpo_params,
)
