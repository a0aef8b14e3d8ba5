"""Device mesh + sharding plumbing.

TPU-native replacement for the reference's two parallelism schemes
(SURVEY.md section 2.10):

- ``nn.DataParallel`` scatter/gather (``/root/reference/NeRF/create_nerf.py:56-69``)
- multi-process DDP over gloo (``/root/reference/nerfplusplus/
  ddp_train_nerf.py:296-302,631-634`` + ``create_nerf.py:54-62``)

Here a single program lays out a ``jax.sharding.Mesh`` with a ``data`` axis
(rays) and an optional ``model`` axis (MLP width, tensor-parallel). The ray
batch shards over ``data``; parameters are replicated (or width-sharded over
``model``); XLA inserts the gradient ``psum`` over ICI — including the camera
parameters, fixing the reference's per-rank camera divergence (SURVEY.md
section 3.5). No process-group bootstrap, no divisibility crashes (batches
pad to shard multiples).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_data * n_model > len(devices):
        raise ValueError(
            f"make_mesh needs n_data*n_model = {n_data}*{n_model} devices but only "
            f"{len(devices)} are visible ({devices[0].platform if devices else 'none'}). "
            "For a virtual CPU mesh, call jax.config.update('jax_platforms', 'cpu') "
            "and jax.config.update('jax_num_cpu_devices', N) BEFORE any other jax "
            "call — the axon TPU plugin ignores the JAX_PLATFORMS env var."
        )
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """First-dim sharding over the data axis (ray batches)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: dict, *, pad: bool = True) -> dict:
    """Place a host batch onto the mesh, rays sharded over ``data``.

    Every array whose leading dim is at least the data-axis size is sharded
    over ``data``; non-divisible leading dims are edge-padded to the next
    multiple first (``pad=True``, the default) or rejected loudly
    (``pad=False``) — never silently replicated. Scalars and short metadata
    arrays (leading dim < data-axis size, e.g. ``pair_idx``) replicate.
    Callers that need the true pre-pad length should use
    :func:`pad_to_multiple` themselves and mask downstream.
    """
    n_data = mesh.shape[DATA_AXIS]
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim >= 1 and v.shape[0] >= n_data:
            if v.shape[0] % n_data != 0:
                if not pad:
                    raise ValueError(
                        f"batch[{k!r}] has leading dim {v.shape[0]}, not divisible "
                        f"by the data axis ({n_data}); pass pad=True or use "
                        "pad_to_multiple + a mask."
                    )
                v, _ = pad_to_multiple(v, n_data)
            out[k] = jax.device_put(jax.numpy.asarray(v), data_sharded(mesh))
        else:
            out[k] = jax.device_put(jax.numpy.asarray(v), replicated(mesh))
    return out


def replicate_state(mesh: Mesh, state):
    """Replicate a train state (params + opt state) across the mesh."""
    return jax.device_put(state, replicated(mesh))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad with edge values to a multiple; returns (padded, original_len).

    Replaces the reference's hard divisibility requirement
    (``ddp_train_nerf.py:144-146``) with pad-and-mask.
    """
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    width = [(0, 0)] * x.ndim
    width[axis] = (0, pad)
    return np.pad(x, width, mode="edge"), n


def model_parallel_mlp_sharding(mesh: Mesh, params):
    """NamedShardings width-sharding an MLP param pytree over ``model``.

    The production tensor-parallel layout (used by ``__graft_entry__``'s
    multichip dryrun): hidden ``pts`` layers alternate column/row weight
    sharding so activations stay width-sharded through Megatron-style
    pairs — even layers shard the OUT dim (``P(None, model)``, bias
    sharded with it), odd layers shard the IN dim (``P(model, None)``,
    bias replicated; XLA inserts the psum over the partial products).
    Head layers (feature/alpha/views/rgb) get column sharding when their
    out dim divides, else row sharding when their in dim divides (skip
    concats make some in dims indivisible), else replicate. Returns a
    pytree of NamedShardings matching ``params``.
    """
    n_model = mesh.shape[MODEL_AXIS]
    col_w = NamedSharding(mesh, P(None, MODEL_AXIS))
    row_w = NamedSharding(mesh, P(MODEL_AXIS, None))
    col_b = NamedSharding(mesh, P(MODEL_AXIS))
    rep = NamedSharding(mesh, P())

    def layer_spec(layer, prefer: str):
        w = layer.get("w")
        if w is None or getattr(w, "ndim", 0) != 2:
            return {k: rep for k in layer}
        can_col = w.shape[1] % n_model == 0
        can_row = w.shape[0] % n_model == 0
        order = ("col", "row") if prefer == "col" else ("row", "col")
        for choice in order:
            if choice == "col" and can_col:
                return {k: (col_w if k == "w" else
                            col_b if k == "b" else rep) for k in layer}
            if choice == "row" and can_row:
                return {k: (row_w if k == "w" else rep) for k in layer}
        return {k: rep for k in layer}

    def is_layer_stack(v):
        return (isinstance(v, (list, tuple)) and len(v)
                and all(isinstance(l, dict) and "w" in l for l in v))

    def mlp_spec(node):
        if not isinstance(node, dict):
            return jax.tree.map(lambda _: rep, node)
        out = {}
        for k, v in node.items():
            if is_layer_stack(v):  # hidden stacks: NeRF "pts", NeRF++ "base"
                out[k] = type(v)(
                    layer_spec(l, "col" if i % 2 == 0 else "row")
                    for i, l in enumerate(v))
            elif isinstance(v, dict) and "w" in v:
                out[k] = layer_spec(v, "col")
            elif isinstance(v, dict):  # nested nets: NeRF++ "fg"/"bg"
                out[k] = mlp_spec(v)
            else:
                out[k] = jax.tree.map(lambda _: rep, v)
        return out

    if isinstance(params, (list, tuple)) and not is_layer_stack(params):
        return type(params)(mlp_spec(x) for x in params)  # e.g. "levels"
    return mlp_spec(params)
