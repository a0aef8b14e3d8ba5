"""SuperGlue correspondence via the ``transformers`` port.

The reference's primary matcher is SuperPoint+SuperGlue from the
``thirdparty/superglue`` submodule (``model/reprojection.py:54-70`` builds
it, ``:118-163`` runs one pair). That submodule is not vendored and its
pretrained weights are not in this image — but ``transformers`` ships a
faithful port of BOTH networks (``SuperGlueForKeypointMatching`` wraps a
SuperPoint keypoint detector), so this provider runs the real
architecture end-to-end:

- with ``pretrained`` (a HF hub id or local directory; resolved
  offline-only) it is the reference's matcher, weights included;
- with ``config`` (a ``SuperGlueConfig``) it runs randomly initialised —
  used by the hermetic plumbing tests so that the day weights land, only
  the checkpoint path changes.

Returns :class:`~scnerf_tpu.matching.provider.PairMatches` like every
other provider, feeding the same padded-match PRD path.
"""
from __future__ import annotations

import numpy as np

from scnerf_tpu.matching.provider import PairMatches

# The magic-leap weights as published on the HF hub (the same weights the
# reference's init_superglue downloads — indoor/outdoor selection mirrors
# --superglue_weight, config_argparse.py:131-140).
HUB_IDS = {
    "outdoor": "magic-leap-community/superglue_outdoor",
    "indoor": "magic-leap-community/superglue_indoor",
}


def tiny_superglue_config():
    """A small random-init architecture for hermetic tests (~240k params,
    <1 s inference on CPU). Same code path as the full model."""
    from transformers import SuperGlueConfig, SuperPointConfig

    kp = SuperPointConfig(
        encoder_hidden_sizes=[16, 16, 32, 32], decoder_hidden_size=32,
        keypoint_decoder_dim=65, descriptor_decoder_dim=64,
        keypoint_threshold=0.0, max_keypoints=64, nms_radius=4,
    )
    return SuperGlueConfig(
        keypoint_detector_config=kp, hidden_size=64,
        keypoint_encoder_sizes=[16, 32, 64],
        gnn_layers_types=["self", "cross"] * 2,
        sinkhorn_iterations=10, num_attention_heads=4,
    )


class HFSuperGlueMatcher:
    """SuperPoint+SuperGlue matcher backed by ``transformers``.

    Args mirror the reference's ``init_superglue`` knobs
    (``reprojection.py:54-70`` / ``config_argparse.py:131-158``).
    ``keypoint_threshold`` / ``max_keypoints`` / ``nms_radius`` /
    ``sinkhorn_iterations`` are runtime (non-weight) parameters, so they
    are applied onto the loaded config.
    """

    def __init__(
        self,
        pretrained: str | None = None,
        weights: str = "outdoor",
        config=None,
        nms_radius: int = 4,
        keypoint_threshold: float = 0.005,
        max_keypoints: int = 1024,
        sinkhorn_iterations: int = 20,
        match_threshold: float = 0.2,
        device: str = "cpu",
    ):
        import torch
        from transformers import SuperGlueForKeypointMatching, SuperGlueImageProcessor

        self._torch = torch
        self.device = device
        self.match_threshold = match_threshold
        if config is not None:
            self._model = SuperGlueForKeypointMatching(config)
            self._processor = SuperGlueImageProcessor()
        else:
            name = pretrained or HUB_IDS[weights]
            # offline-only: this image has no egress; weights must already
            # be in the local HF cache or be a local directory.
            self._model = SuperGlueForKeypointMatching.from_pretrained(
                name, local_files_only=True
            )
            self._processor = SuperGlueImageProcessor.from_pretrained(
                name, local_files_only=True
            )
            kp = self._model.config.keypoint_detector_config
            kp.nms_radius = nms_radius
            kp.keypoint_threshold = keypoint_threshold
            kp.max_keypoints = max_keypoints
            self._model.config.sinkhorn_iterations = sinkhorn_iterations
        self._model = self._model.eval().to(device)

    def match(self, img0: np.ndarray, img1: np.ndarray) -> PairMatches:
        torch = self._torch

        def to_u8(img):
            img = np.asarray(img)
            if img.dtype != np.uint8:
                img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, axis=-1)
            return img

        a, b = to_u8(img0), to_u8(img1)
        inputs = self._processor([[a, b]], return_tensors="pt").to(self.device)
        with torch.no_grad():
            out = self._model(**inputs)
        res = self._processor.post_process_keypoint_matching(
            out,
            target_sizes=[[a.shape[:2], b.shape[:2]]],
            threshold=self.match_threshold,
        )[0]
        kps0 = res["keypoints0"].cpu().numpy().astype(np.float32).reshape(-1, 2)
        kps1 = res["keypoints1"].cpu().numpy().astype(np.float32).reshape(-1, 2)
        conf = res["matching_scores"].cpu().numpy().astype(np.float32).reshape(-1)
        return PairMatches(kps0, kps1, conf)


def hf_superglue_available(weights: str = "outdoor",
                           pretrained: str | None = None) -> bool:
    """True iff the transformers port AND local pretrained weights are
    usable (no egress in this environment, so hub ids resolve only from
    the local cache)."""
    try:
        from transformers import SuperGlueForKeypointMatching  # noqa: F401
        from transformers.utils import cached_file

        name = pretrained or HUB_IDS[weights]
        import os

        if os.path.isdir(name):
            return True
        return cached_file(
            name, "config.json", local_files_only=True,
            _raise_exceptions_for_missing_entries=False,
        ) is not None
    except Exception:
        return False
