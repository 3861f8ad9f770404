"""Device mesh + sharding helpers.

Replaces the reference's HF Accelerate / torch.distributed DDP backend
(reference methods_config/accelerate_config.yml, per-batch
`accelerator.wait_for_everyone()` barriers at e.g.
methods/semi_supervised_learning/textual_prompt.py:128, and gather-with-
padding-truncation at :139-149) with the TPU-native model:

- one `jax.sharding.Mesh` over all chips; the batch axis is sharded on
  'data', parameters are replicated (optionally the big tower weights are
  sharded on a 'model' axis for ViT-L/14-scale tensor parallelism);
- gradient all-reduce is implicit in jit-of-grad (XLA psum over 'data');
- "gather" of eval predictions is just reading a globally-sharded array -
  unpadding is exact (no drop_duplicates heuristic, which could drop
  legitimate rows in the reference, textual_prompt.py:294).

SPMD is implicitly synchronized: the reference's per-batch host barrier has
no equivalent and no cost here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Optional[Sequence[str]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a device mesh. Default: 1D ('data',) over all local devices.

    :param shape: e.g. (4, 2) with axis_names ('data', 'model')
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
        axis_names = axis_names or ("data",)
    else:
        axis_names = axis_names or ("data", "model")[: len(shape)]
    dev_array = mesh_utils.create_device_mesh(tuple(shape), devices=devices)
    return Mesh(dev_array, tuple(axis_names))


def mesh_from_config(cfg) -> Mesh:
    """MESH_SHAPE '' -> 1D data mesh; '4,2' -> (data=4, model=2)."""
    if getattr(cfg, "MESH_SHAPE", ""):
        shape = tuple(int(s) for s in cfg.MESH_SHAPE.split(","))
        return make_mesh(shape)
    return make_mesh()


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding on the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_parallelism(mesh: Mesh) -> int:
    return mesh.shape.get("data", 1)


def pad_to_multiple(arr: np.ndarray, multiple: int, fill=0):
    """Pad axis 0 to a multiple (so shards are equal); returns (padded, n)."""
    n = arr.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill), n


def put_batch(mesh: Mesh, *arrays: np.ndarray):
    """Device-put host arrays with batch-dim sharding over 'data'."""
    sh = data_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def put_replicated(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    return jax.device_put(tree, replicated(mesh))


# ---------------------------------------------------------------------------
# Optional tensor-parallel sharding of CLIP tower weights (ViT-L/14 scale).
# The MLP c_fc/c_proj and fused qkv are sharded on the hidden axis; XLA
# inserts the all-reduces. Free with NamedSharding - no code changes in the
# model (SURVEY.md §2.7: optional 2D sharding "free with pjit").
# ---------------------------------------------------------------------------
def clip_param_sharding(mesh: Mesh, params):
    """PartitionSpec tree for CLIP params: TP on 'model' axis if present."""
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def spec_for(path, leaf) -> NamedSharding:
        names = [str(getattr(k, "key", "")) for k in path]
        joined = "/".join(names)
        if leaf.ndim == 2:
            if "c_fc" in joined and names[-1] == "kernel":
                return NamedSharding(mesh, P(None, "model"))
            if "c_proj" in joined and names[-1] == "kernel":
                return NamedSharding(mesh, P("model", None))
            if names[-1] == "in_proj_kernel":
                return NamedSharding(mesh, P(None, "model"))
            if "out_proj" in joined and names[-1] == "kernel":
                return NamedSharding(mesh, P("model", None))
        if leaf.ndim == 1:
            if "c_fc" in joined and names[-1] == "bias":
                return NamedSharding(mesh, P("model"))
            if names[-1] == "in_proj_bias":
                return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [spec_for(path, leaf) for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)
