from scnerf_tpu.render.composite import raw2outputs
from scnerf_tpu.render.renderer import RenderConfig, render_rays, render_chunked
from scnerf_tpu.render.nerfpp_renderer import (
    NerfPPRenderConfig, render_rays_nerfpp, render_chunked_nerfpp,
)
