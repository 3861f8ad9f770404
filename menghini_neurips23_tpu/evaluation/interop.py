"""Artifact interop with the reference's torch formats.

The reference persists trained prompts as pickled torch tensor lists
(textual/visual) and, for multimodal, 5 `torch.save` state_dicts + 3 numpy
pickles (reference utils/compute_metrics.py:105-147 and
methods/semi_supervised_learning/multimodal_prompt.py:148-158).  This module
converts between that layout and ours (numpy arrays / flax subtrees) in both
directions, so reference-produced artifacts can be loaded for side-by-side
parity checks and our artifacts can be emitted in a form the reference
tooling reads.

Torch never touches the training path; it is imported lazily here only when
an artifact actually crosses the boundary.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _to_torch(arr: np.ndarray):
    """numpy -> torch tensor with OWNED, writable memory.  jax exports arrive
    as non-writable views; torch.from_numpy on those warns and writing would
    be undefined behavior."""
    import torch

    buf = np.ascontiguousarray(arr)
    if not buf.flags.writeable:
        buf = buf.copy()
    return torch.from_numpy(buf)


# flax mixer-transformer leaf <-> torch clip.Transformer state_dict key.
# kernel layouts: flax Dense kernels are (in, out); torch weights are
# (out, in) -> transpose on both crossings.
_BLOCK_KEYS = [
    # (flax path within resblocks_i, torch suffix, transpose?)
    (("ln_1", "scale"), "ln_1.weight", False),
    (("ln_1", "bias"), "ln_1.bias", False),
    (("ln_2", "scale"), "ln_2.weight", False),
    (("ln_2", "bias"), "ln_2.bias", False),
    (("attn", "in_proj_kernel"), "attn.in_proj_weight", True),
    (("attn", "in_proj_bias"), "attn.in_proj_bias", False),
    (("attn", "out_proj", "kernel"), "attn.out_proj.weight", True),
    (("attn", "out_proj", "bias"), "attn.out_proj.bias", False),
    (("c_fc", "kernel"), "mlp.c_fc.weight", True),
    (("c_fc", "bias"), "mlp.c_fc.bias", False),
    (("c_proj", "kernel"), "mlp.c_proj.weight", True),
    (("c_proj", "bias"), "mlp.c_proj.bias", False),
]


def to_numpy(x):
    """torch.Tensor / jax array / np -> np.ndarray (None passes through)."""
    if x is None:
        return None
    if hasattr(x, "detach"):  # torch.Tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def mixer_transformer_to_torch_sd(flax_tree: Dict[str, Any]) -> Dict[str, Any]:
    """Our flax mixer-transformer subtree -> reference
    `transformer.state_dict()` layout (torch tensors)."""
    import torch

    sd = {}
    for i, (name, block) in enumerate(sorted(flax_tree.items())):
        assert name.startswith("resblocks_"), name
        idx = name.split("_", 1)[1]
        for path, suffix, tr in _BLOCK_KEYS:
            arr = np.asarray(_get(block, path))
            if tr:
                arr = arr.T
            sd[f"resblocks.{idx}.{suffix}"] = _to_torch(arr)
    return sd


def mixer_transformer_from_torch_sd(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference `transformer.state_dict()` -> our flax subtree."""
    out: Dict[str, Any] = {}
    layers = sorted({k.split(".")[1] for k in sd})
    for idx in layers:
        block: Dict[str, Any] = {}
        for path, suffix, tr in _BLOCK_KEYS:
            arr = to_numpy(sd[f"resblocks.{idx}.{suffix}"])
            if tr:
                arr = arr.T
            _set(block, path, np.ascontiguousarray(arr))
        out[f"resblocks_{idx}"] = block
    return out


def linear_to_torch_sd(flax_dense: Dict[str, Any]) -> Dict[str, Any]:
    """flax Dense {kernel (in,out), bias} -> nn.Linear state_dict."""
    import torch

    return {
        "weight": _to_torch(np.asarray(flax_dense["kernel"]).T),
        "bias": _to_torch(np.asarray(flax_dense["bias"])),
    }


def linear_from_torch_sd(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "kernel": np.ascontiguousarray(to_numpy(sd["weight"]).T),
        "bias": np.ascontiguousarray(to_numpy(sd["bias"])),
    }


def multi_part_to_torch(idx: int, part):
    """Our multimodal epoch_parameters[idx] -> the reference's saved object."""
    import torch

    if part is None:
        return None
    if idx == 0:
        return mixer_transformer_to_torch_sd(part)
    if idx in (1, 2, 3, 4):
        return linear_to_torch_sd(part)
    # 5/6/7: coop / deep / vpt embeddings - reference stores numpy
    # (multimodal_prompt.py:155-157 .detach().cpu().numpy())
    return np.asarray(part)


def multi_part_from_torch(idx: int, obj):
    """The reference's saved object -> our epoch_parameters[idx] layout."""
    if obj is None:
        return None
    if idx == 0:
        return mixer_transformer_from_torch_sd(obj)
    if idx in (1, 2, 3, 4):
        return linear_from_torch_sd(obj)
    return to_numpy(obj)


def tensor_list_to_torch(params):
    """Our [np.ndarray, ...] prompt list -> the reference's pickled torch
    tensor list (textual/visual artifacts)."""
    import torch

    return [None if p is None else _to_torch(np.asarray(p)) for p in params]


def tensor_list_from_torch(obj):
    """A reference prompt artifact (list/tuple of torch tensors or arrays,
    or a bare tensor) -> list of np.ndarray."""
    if not isinstance(obj, (list, tuple)):
        obj = [obj]
    return [to_numpy(p) for p in obj]
