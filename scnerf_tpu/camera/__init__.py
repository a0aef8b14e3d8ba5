from scnerf_tpu.camera.model import (
    Camera, CameraConfig, init_camera, get_intrinsic, get_extrinsic,
    get_extrinsics, get_distortion, sample_noise_grid, OPENGL, OPENCV,
    camera_log_dict,
)
from scnerf_tpu.camera.rays import (
    pixels_to_rays, rays_full_image, rays_no_camera, apply_radial_distortion,
    full_image_pixels,
)
