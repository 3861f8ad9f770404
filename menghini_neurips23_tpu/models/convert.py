"""OpenAI/torch CLIP checkpoint -> Flax pytree converter.

Replaces the reference's `clip.load(...)` weight loading (pip `clip` package,
reference requirements.txt:2).  Accepts:
- an OpenAI CLIP TorchScript archive or a plain torch state_dict (.pt),
- a numpy dict (name -> ndarray) with OpenAI state_dict keys,
- our own .npz export (flat '/'-joined flax paths).

Weights are stored fp32 regardless of the source dtype (the OpenAI GPU
checkpoints are fp16); compute dtype is chosen at model construction.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping, Tuple

import numpy as np

from menghini_neurips23_tpu.models.clip import CLIP
from menghini_neurips23_tpu.models.configs import ARCHS, CLIPArch


def infer_arch(sd: Mapping[str, np.ndarray]) -> CLIPArch:
    """Infer the architecture from OpenAI state_dict shapes."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_patch = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    image_resolution = grid * vision_patch
    vision_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")}
    )
    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    transformer_width = sd["ln_final.weight"].shape[0]
    transformer_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")}
    )
    for arch in ARCHS.values():
        if (
            arch.vision_width == vision_width
            and arch.vision_patch_size == vision_patch
            and arch.embed_dim == embed_dim
            and arch.vision_layers == vision_layers
        ):
            return arch
    return CLIPArch(
        name=f"custom-{vision_width}x{vision_layers}p{vision_patch}",
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch,
        context_length=context_length,
        vocab_size=vocab_size,
        transformer_width=transformer_width,
        transformer_heads=transformer_width // 64,
        transformer_layers=transformer_layers,
    )


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _block(sd, prefix):
    """One ResidualAttentionBlock: torch keys -> our flax names."""
    f32 = lambda k: np.asarray(sd[k], np.float32)
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {
            "in_proj_kernel": f32(f"{prefix}.attn.in_proj_weight").T,
            "in_proj_bias": f32(f"{prefix}.attn.in_proj_bias"),
            "out_proj": {
                "kernel": f32(f"{prefix}.attn.out_proj.weight").T,
                "bias": f32(f"{prefix}.attn.out_proj.bias"),
            },
        },
        "c_fc": {"kernel": f32(f"{prefix}.mlp.c_fc.weight").T,
                 "bias": f32(f"{prefix}.mlp.c_fc.bias")},
        "c_proj": {"kernel": f32(f"{prefix}.mlp.c_proj.weight").T,
                   "bias": f32(f"{prefix}.mlp.c_proj.bias")},
    }


def convert_state_dict(sd: Mapping[str, np.ndarray]) -> Tuple[CLIPArch, dict]:
    """OpenAI CLIP state_dict (numpy) -> (arch, flax params pytree)."""
    arch = infer_arch(sd)
    f32 = lambda k: np.asarray(sd[k], np.float32)

    # conv1 (O, C, P, P) -> patchify matmul kernel ((P,P,C) flattened, O);
    # ordering must match VisionTower.embed's (p_h, p_w, channel) patch layout.
    conv1 = f32("visual.conv1.weight")
    O, C, P, _ = conv1.shape
    conv1_kernel = conv1.transpose(2, 3, 1, 0).reshape(P * P * C, O)

    visual = {
        "conv1_kernel": conv1_kernel,
        "class_embedding": f32("visual.class_embedding"),
        "positional_embedding": f32("visual.positional_embedding"),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": f32("visual.proj"),
        "transformer": {
            f"resblocks_{i}": _block(sd, f"visual.transformer.resblocks.{i}")
            for i in range(arch.vision_layers)
        },
    }
    text = {
        "token_embedding": {"embedding": f32("token_embedding.weight")},
        "positional_embedding": f32("positional_embedding"),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": f32("text_projection"),
        "transformer": {
            f"resblocks_{i}": _block(sd, f"transformer.resblocks.{i}")
            for i in range(arch.transformer_layers)
        },
    }
    params = {
        "params": {
            "visual": visual,
            "text": text,
            "logit_scale": f32("logit_scale"),
        }
    }
    return arch, params


def is_hf_state_dict(sd: Mapping[str, np.ndarray]) -> bool:
    return any(k.startswith("text_model.") or k.startswith("vision_model.") for k in sd)


def convert_hf_state_dict(sd: Mapping[str, np.ndarray]) -> Tuple[CLIPArch, dict]:
    """HuggingFace CLIPModel state_dict -> (arch, flax params).

    HF stores q/k/v projections separately and projections as Linear weights;
    this reassembles the fused OpenAI layout and reuses convert_state_dict.
    """
    f32 = lambda k: np.asarray(sd[k], np.float32)
    out: Dict[str, np.ndarray] = {}

    def copy_block(hf_prefix: str, oa_prefix: str, n_layers: int):
        for i in range(n_layers):
            h = f"{hf_prefix}.layers.{i}"
            o = f"{oa_prefix}.resblocks.{i}"
            out[f"{o}.ln_1.weight"] = f32(f"{h}.layer_norm1.weight")
            out[f"{o}.ln_1.bias"] = f32(f"{h}.layer_norm1.bias")
            out[f"{o}.ln_2.weight"] = f32(f"{h}.layer_norm2.weight")
            out[f"{o}.ln_2.bias"] = f32(f"{h}.layer_norm2.bias")
            out[f"{o}.attn.in_proj_weight"] = np.concatenate(
                [f32(f"{h}.self_attn.{p}_proj.weight") for p in ("q", "k", "v")], axis=0
            )
            out[f"{o}.attn.in_proj_bias"] = np.concatenate(
                [f32(f"{h}.self_attn.{p}_proj.bias") for p in ("q", "k", "v")], axis=0
            )
            out[f"{o}.attn.out_proj.weight"] = f32(f"{h}.self_attn.out_proj.weight")
            out[f"{o}.attn.out_proj.bias"] = f32(f"{h}.self_attn.out_proj.bias")
            out[f"{o}.mlp.c_fc.weight"] = f32(f"{h}.mlp.fc1.weight")
            out[f"{o}.mlp.c_fc.bias"] = f32(f"{h}.mlp.fc1.bias")
            out[f"{o}.mlp.c_proj.weight"] = f32(f"{h}.mlp.fc2.weight")
            out[f"{o}.mlp.c_proj.bias"] = f32(f"{h}.mlp.fc2.bias")

    n_text = len({k.split(".")[3] for k in sd if k.startswith("text_model.encoder.layers.")})
    n_vis = len({k.split(".")[3] for k in sd if k.startswith("vision_model.encoder.layers.")})
    copy_block("text_model.encoder", "transformer", n_text)
    copy_block("vision_model.encoder", "visual.transformer", n_vis)

    out["token_embedding.weight"] = f32("text_model.embeddings.token_embedding.weight")
    out["positional_embedding"] = f32("text_model.embeddings.position_embedding.weight")
    out["ln_final.weight"] = f32("text_model.final_layer_norm.weight")
    out["ln_final.bias"] = f32("text_model.final_layer_norm.bias")
    # HF text_projection is a Linear (E, TW) applied as x @ W.T -> OpenAI (TW, E)
    out["text_projection"] = f32("text_projection.weight").T
    out["visual.proj"] = f32("visual_projection.weight").T
    out["visual.conv1.weight"] = f32("vision_model.embeddings.patch_embedding.weight")
    out["visual.class_embedding"] = f32("vision_model.embeddings.class_embedding")
    out["visual.positional_embedding"] = f32(
        "vision_model.embeddings.position_embedding.weight"
    )
    out["visual.ln_pre.weight"] = f32("vision_model.pre_layrnorm.weight")
    out["visual.ln_pre.bias"] = f32("vision_model.pre_layrnorm.bias")
    out["visual.ln_post.weight"] = f32("vision_model.post_layernorm.weight")
    out["visual.ln_post.bias"] = f32("vision_model.post_layernorm.bias")
    out["logit_scale"] = f32("logit_scale")
    return convert_state_dict(out)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load an OpenAI CLIP .pt (TorchScript archive or state_dict) as numpy."""
    import torch  # CPU-only wheel, host-side use only

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "numpy") or hasattr(v, "detach")}


def save_npz(params: dict, path: str) -> None:
    """Export a flax pytree as a flat .npz ('/'-joined paths)."""
    import jax

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_npz(path: str) -> dict:
    """Load a flat .npz back into a nested pytree."""
    flat = dict(np.load(path))
    tree: dict = {}
    for name, arr in flat.items():
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def load_clip(path: str):
    """Load CLIP weights from .pt/.npz/.npy-dict -> (arch, model, params)."""
    if path.endswith(".npz"):
        tree = load_npz(path)
        # .npz export is a full flax tree; infer arch from shapes
        sd_like = tree["params"]
        arch = None
        for a in ARCHS.values():
            if sd_like["visual"]["proj"].shape == (a.vision_width, a.embed_dim) and len(
                sd_like["visual"]["transformer"]
            ) == a.vision_layers:
                arch = a
                break
        if arch is None:
            raise ValueError(f"Cannot infer architecture from {path}")
        return arch, CLIP(arch), tree
    if path.endswith(".pt") or path.endswith(".pth") or path.endswith(".bin"):
        sd = load_torch_checkpoint(path)
        if is_hf_state_dict(sd):
            arch, params = convert_hf_state_dict(sd)
        else:
            arch, params = convert_state_dict(sd)
        return arch, CLIP(arch), params
    raise ValueError(f"Unsupported checkpoint format: {path}")


if __name__ == "__main__":
    # CLI: convert a torch CLIP checkpoint (OpenAI or HF layout) to .npz
    #   python -m menghini_neurips23_tpu.models.convert in.pt out.npz
    import sys

    src, dst = sys.argv[1], sys.argv[2]
    sd = load_torch_checkpoint(src)
    if is_hf_state_dict(sd):
        arch, params = convert_hf_state_dict(sd)
    else:
        arch, params = convert_state_dict(sd)
    save_npz(params, dst)
    print(f"converted {src} ({arch.name}) -> {dst}")
