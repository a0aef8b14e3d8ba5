"""Reference-checkpoint conversion (torch state dicts -> scnerf-tpu pytrees).

Lets an SCNeRF user bring trained reference checkpoints across. Mappings:

- NeRF MLP (``/root/reference/NeRF/run_nerf_helpers.py:76-128``):
  ``pts_linears.{i}.weight`` (out, in) -> ``params["pts"][i]["w"]`` (in, out)
  transposed, same for bias; heads ``feature_linear``/``alpha_linear``/
  ``views_linears.0``/``rgb_linear`` -> ``feature``/``alpha``/``views``/
  ``rgb``.
- NeRF++ MLPNet (``nerf_network.py:70-142``): ``base_layers.{i}.0`` ->
  ``base[i]``, ``sigma_layers.0`` -> ``sigma``, ``base_remap_layers.0`` ->
  ``remap``, ``rgb_layers.{0,2}`` -> ``rgb0``/``rgb1``.
- Camera model (``model/camera_model.py``): field names are identical
  (``intrinsics_initial`` -> ``intrinsics_init`` etc.).

Inputs are plain dicts of numpy arrays — pass
``{k: v.numpy() for k, v in torch.load(path)["network_fn_state_dict"].items()}``
so this module itself never imports torch.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _dense(sd: dict, prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"])
    b = np.asarray(sd[f"{prefix}.bias"])
    return {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}


def torch_nerf_to_params(state_dict: dict, depth: int = 8) -> dict:
    """Reference ``NeRF`` module state dict -> our MLP param pytree."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    params = {"pts": [_dense(sd, f"pts_linears.{i}") for i in range(depth)]}
    if "feature_linear.weight" in sd:
        params["feature"] = _dense(sd, "feature_linear")
        params["alpha"] = _dense(sd, "alpha_linear")
        params["views"] = _dense(sd, "views_linears.0")
        params["rgb"] = _dense(sd, "rgb_linear")
    else:
        params["output"] = _dense(sd, "output_linear")
    return params


def torch_mlpnet_to_params(state_dict: dict, depth: int = 8) -> dict:
    """Reference NeRF++ ``MLPNet`` state dict -> our param pytree."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    return {
        "base": [_dense(sd, f"base_layers.{i}.0") for i in range(depth)],
        "sigma": _dense(sd, "sigma_layers.0"),
        "remap": _dense(sd, "base_remap_layers.0"),
        "rgb0": _dense(sd, "rgb_layers.0"),
        "rgb1": _dense(sd, "rgb_layers.2"),
    }


def torch_nerfnet_to_params(state_dict: dict, depth: int = 8) -> dict:
    """Reference ``NerfNet``/``NerfNetWithAutoExpo`` -> our fg/bg pytree."""
    sd = {k.replace("module.", "").replace("nerf_net.", ""): v
          for k, v in state_dict.items()}
    fg = {k[len("fg_net."):]: v for k, v in sd.items() if k.startswith("fg_net.")}
    bg = {k[len("bg_net."):]: v for k, v in sd.items() if k.startswith("bg_net.")}
    return {
        "fg": torch_mlpnet_to_params(fg, depth),
        "bg": torch_mlpnet_to_params(bg, depth),
    }


def torch_camera_to_fields(state_dict: dict) -> dict:
    """Reference camera model state dict -> kwargs for ``Camera.replace``.

    Distortion-variant checkpoints (detected by ``distortion_noise``) carry
    the tied ray-noise quirk: ``ray_o_noise`` and ``ray_d_noise`` alias ONE
    torch buffer, so both saved tensors equal the shared value ``s``
    (``camera_model.py:224,258-262``). Our tied camera reads each path as
    ``own_grid + stop_gradient(other_grid)``, i.e. the effective value is
    the SUM of the two leaves — so the shared tensor maps to
    ``ray_o_grid = s, ray_d_grid = 0`` (mapping both leaves to ``s`` would
    double the noise)."""
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in state_dict.items()}
    mapping = {
        "intrinsics_initial": "intrinsics_init",
        "extrinsics_initial": "extrinsics_init",
        "distortion_initial": "distortion_init",
        "intrinsics_noise": "intrinsics_noise",
        "extrinsics_noise": "extrinsics_noise",
        "distortion_noise": "distortion_noise",
        "ray_o_noise": "ray_o_grid",
        "ray_d_noise": "ray_d_grid",
    }
    out = {ours: jnp.asarray(sd[theirs]) for theirs, ours in mapping.items()
           if theirs in sd}
    if "distortion_noise" in sd and "ray_d_noise" in sd:
        out["ray_d_grid"] = jnp.zeros_like(out["ray_d_grid"])
    return out


def params_to_torch_nerf(params: dict, prefix: str = "module.") -> dict:
    """Our MLP param pytree -> a reference ``NeRF`` state dict of numpy
    arrays (inverse of :func:`torch_nerf_to_params`; the caller wraps values
    in ``torch.from_numpy``). Used by the trajectory-parity harness to start
    the actual torch reference trainer from OUR initial weights."""
    out = {}

    def put(name, leaf):
        out[f"{prefix}{name}.weight"] = np.ascontiguousarray(np.asarray(leaf["w"]).T)
        out[f"{prefix}{name}.bias"] = np.asarray(leaf["b"])

    for i, layer in enumerate(params["pts"]):
        put(f"pts_linears.{i}", layer)
    if "feature" in params:
        put("feature_linear", params["feature"])
        put("alpha_linear", params["alpha"])
        put("views_linears.0", params["views"])
        put("rgb_linear", params["rgb"])
    else:
        put("output_linear", params["output"])
    return out


def params_to_torch_mlpnet(params: dict, prefix: str = "") -> dict:
    """Our NeRF++ MLPNet pytree -> reference state dict of numpy arrays
    (inverse of :func:`torch_mlpnet_to_params`)."""
    out = {}

    def put(name, leaf):
        out[f"{prefix}{name}.weight"] = np.ascontiguousarray(np.asarray(leaf["w"]).T)
        out[f"{prefix}{name}.bias"] = np.asarray(leaf["b"])

    for i, layer in enumerate(params["base"]):
        put(f"base_layers.{i}.0", layer)
    put("sigma_layers.0", params["sigma"])
    put("base_remap_layers.0", params["remap"])
    put("rgb_layers.0", params["rgb0"])
    put("rgb_layers.2", params["rgb1"])
    return out


def remap_autoexpo_name(img_path: str) -> str:
    """The reference's autoexpo ParameterDict key for an image path
    (``ddp_model.py:146-154``): dots -> dashes, keep the last three path
    components."""
    name = img_path.replace(".", "-")
    if name.endswith("/"):
        name = name[:-1]
    idx = name.rfind("/")
    for _ in range(2):
        if idx >= 0:
            idx = name[:idx].rfind("/")
    return name[idx + 1:]


def params_to_torch_nerfnet(params: dict,
                            prefix: str = "module.nerf_net.",
                            ddp_prefix: str = "module.",
                            img_paths: list | None = None) -> dict:
    """Our fg/bg NeRF++ level pytree -> reference ``NerfNetWithAutoExpo``
    state dict (``ddp_model.py:157-188``; DDP wrapping adds the leading
    ``module.``). Used by the NeRF++ trajectory-parity harness to start the
    reference trainer from OUR initial weights.

    When the level carries auto-exposure params (``(N, 2)`` indexed by
    image id), pass the trainer's image paths (loader order) so the
    name-keyed ``autoexpo_params.<remapped>`` entries can be emitted."""
    out = {}
    out.update(params_to_torch_mlpnet(params["fg"], prefix=f"{prefix}fg_net."))
    out.update(params_to_torch_mlpnet(params["bg"], prefix=f"{prefix}bg_net."))
    if "autoexpo" in params:
        assert img_paths is not None, "autoexpo conversion needs image paths"
        ae = np.asarray(params["autoexpo"])
        assert ae.shape[0] == len(img_paths), (ae.shape, len(img_paths))
        for i, p in enumerate(img_paths):
            key = f"{ddp_prefix}autoexpo_params.{remap_autoexpo_name(p)}"
            out[key] = np.ascontiguousarray(ae[i])
    return out


def camera_fields_to_torch(camera) -> dict:
    """Our ``Camera`` pytree -> reference camera-model state dict (numpy).

    Inverse of :func:`torch_camera_to_fields`; only fields the given camera
    actually carries (non-None) are emitted. Tied cameras
    (``config.tied_ray_noise``) export the effective shared value — the SUM
    of the two leaves — as both ray-noise entries, matching the reference's
    aliased-storage layout."""
    mapping = {
        "intrinsics_init": "intrinsics_initial",
        "extrinsics_init": "extrinsics_initial",
        "distortion_init": "distortion_initial",
        "intrinsics_noise": "intrinsics_noise",
        "extrinsics_noise": "extrinsics_noise",
        "distortion_noise": "distortion_noise",
        "ray_o_grid": "ray_o_noise",
        "ray_d_grid": "ray_d_noise",
    }
    cfg = getattr(camera, "config", None)
    out = {}
    for ours, theirs in mapping.items():
        if ours.startswith("distortion") and not (
            cfg is not None and getattr(cfg, "use_distortion", False)
        ):
            # Our pytree carries zero distortion leaves even for pinhole
            # cameras; the reference's pinhole state dicts have no such
            # keys and load_state_dict rejects unexpected ones.
            continue
        v = getattr(camera, ours, None)
        if v is not None:
            out[theirs] = np.asarray(v)
    if cfg is not None and getattr(cfg, "tied_ray_noise", False) and \
            "ray_o_noise" in out and "ray_d_noise" in out:
        s = out["ray_o_noise"] + out["ray_d_noise"]
        out["ray_o_noise"] = s
        out["ray_d_noise"] = s.copy()
    return out


def load_reference_checkpoint(path: str, depth: int = 8) -> dict:
    """Load a reference ``.tar`` training checkpoint into our formats.

    The reference saves ``{global_step, network_fn_state_dict,
    network_fine_state_dict, optimizer_state_dict[, camera_model]}``
    (``run_nerf.py:627-639``). Returns::

        {"step": int,
         "coarse": <our MLP pytree>, "fine": <pytree or None>,
         "camera_fields": <kwargs for Camera.replace, or None>}

    Optimizer state is NOT converted (torch Adam state is per-tensor keyed;
    restarting Adam moments on migration is standard practice). Requires
    torch to read the tar.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu")
    as_np = lambda sd: {k: v.detach().numpy() for k, v in sd.items()}
    out = {
        "step": int(ckpt.get("global_step", 0)),
        "coarse": torch_nerf_to_params(as_np(ckpt["network_fn_state_dict"]), depth),
        "fine": (
            torch_nerf_to_params(as_np(ckpt["network_fine_state_dict"]), depth)
            if ckpt.get("network_fine_state_dict") else None
        ),
        "camera_fields": (
            torch_camera_to_fields(as_np(ckpt["camera_model"]))
            if "camera_model" in ckpt else None
        ),
    }
    return out
