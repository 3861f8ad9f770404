"""Real-checkpoint on-ramp: the torch.jit.load branch of models/convert.py.

The very first thing a connected-machine user runs (REPRODUCE.md step 1) is
`python -m menghini_neurips23_tpu.models.convert ViT-B-32.pt vitb32.npz` on
the real OpenAI archive, which is a TorchScript file (reference
models/clip_encoders.py:13 `clip.load`).  These tests build a synthetic
TorchScript-saved CLIP with the OpenAI state_dict key layout at tiny-test
dims and exercise every branch of that chain end to end: jit archive ->
arch inference -> flax params identical to convert_state_dict -> .npz
export/reload -> a workflow run with CLIP_CKPT set.
"""

import json
from collections import OrderedDict

import numpy as np
import pytest

from menghini_neurips23_tpu.models.configs import TINY_TEST
from menghini_neurips23_tpu.models.convert import (
    convert_state_dict,
    infer_arch,
    load_clip,
    load_npz,
    load_torch_checkpoint,
    save_npz,
)

torch = pytest.importorskip("torch")
nn = torch.nn


def _build_torch_clip(arch=TINY_TEST, seed=0):
    """A torch module whose state_dict carries the OpenAI CLIP key layout
    (the compatibility contract convert.py consumes; same names the pip
    `clip` package's archives expose)."""

    class Block(nn.Module):
        def __init__(self, width, heads):
            super().__init__()
            self.ln_1 = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, heads)
            self.ln_2 = nn.LayerNorm(width)
            self.mlp = nn.Sequential(
                OrderedDict(
                    [
                        ("c_fc", nn.Linear(width, width * 4)),
                        ("gelu", nn.GELU()),
                        ("c_proj", nn.Linear(width * 4, width)),
                    ]
                )
            )

        def forward(self, x):
            return x

    class Transformer(nn.Module):
        def __init__(self, width, layers, heads):
            super().__init__()
            self.resblocks = nn.Sequential(
                *[Block(width, heads) for _ in range(layers)]
            )

        def forward(self, x):
            return x

    class Visual(nn.Module):
        def __init__(self, a):
            super().__init__()
            w = a.vision_width
            self.conv1 = nn.Conv2d(
                3, w, a.vision_patch_size, stride=a.vision_patch_size, bias=False
            )
            self.class_embedding = nn.Parameter(torch.empty(w))
            self.positional_embedding = nn.Parameter(
                torch.empty(a.num_patches + 1, w)
            )
            self.ln_pre = nn.LayerNorm(w)
            self.transformer = Transformer(w, a.vision_layers, a.transformer_heads)
            self.ln_post = nn.LayerNorm(w)
            self.proj = nn.Parameter(torch.empty(w, a.embed_dim))

        def forward(self, x):
            return x

    class TorchCLIP(nn.Module):
        def __init__(self, a):
            super().__init__()
            tw = a.transformer_width
            self.visual = Visual(a)
            self.transformer = Transformer(
                tw, a.transformer_layers, a.transformer_heads
            )
            self.token_embedding = nn.Embedding(a.vocab_size, tw)
            self.positional_embedding = nn.Parameter(torch.empty(a.context_length, tw))
            self.ln_final = nn.LayerNorm(tw)
            self.text_projection = nn.Parameter(torch.empty(tw, a.embed_dim))
            self.logit_scale = nn.Parameter(
                torch.tensor(float(np.log(1 / 0.07)))
            )

        def forward(self, x):
            return x

    torch.manual_seed(seed)
    model = TorchCLIP(arch)
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim >= 1:
                nn.init.normal_(p, 0.0, 0.02)
    return model


def _numpy_sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def torch_clip_archives(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    model = _build_torch_clip()
    jit_path = tmp / "tiny_clip_jit.pt"
    sd_path = tmp / "tiny_clip_sd.pt"
    scripted = torch.jit.script(model)
    torch.jit.save(scripted, str(jit_path))
    torch.save(model.state_dict(), str(sd_path))
    return model, str(jit_path), str(sd_path), tmp


def test_torchscript_archive_branch(torch_clip_archives):
    """torch.jit.load branch (convert.py:196): archive -> identical numpy
    state_dict to the in-memory module."""
    model, jit_path, _, _ = torch_clip_archives
    expect = _numpy_sd(model)
    got = load_torch_checkpoint(jit_path)
    assert set(got) == set(expect)
    for k in expect:
        np.testing.assert_array_equal(got[k], expect[k], err_msg=k)


def test_plain_state_dict_branch(torch_clip_archives):
    """torch.load fallback branch: a plain torch.save(state_dict) file."""
    model, _, sd_path, _ = torch_clip_archives
    expect = _numpy_sd(model)
    got = load_torch_checkpoint(sd_path)
    assert set(got) == set(expect)
    for k in expect:
        np.testing.assert_array_equal(got[k], expect[k], err_msg=k)


def test_jit_archive_to_flax_params_matches_direct_convert(torch_clip_archives):
    """archive -> infer_arch -> flax params bit-identical to converting the
    in-memory numpy state_dict (the path REPRODUCE.md step 1 runs)."""
    import jax

    model, jit_path, _, _ = torch_clip_archives
    sd_npy = _numpy_sd(model)
    assert infer_arch(sd_npy).name == TINY_TEST.name

    arch_a, params_a = convert_state_dict(load_torch_checkpoint(jit_path))
    arch_b, params_b = convert_state_dict(sd_npy)
    assert arch_a.name == arch_b.name == TINY_TEST.name
    leaves_a = jax.tree_util.tree_leaves_with_path(params_a)
    leaves_b = jax.tree_util.tree_leaves_with_path(params_b)
    assert len(leaves_a) == len(leaves_b) > 0
    for (pa, la), (pb, lb) in zip(leaves_a, leaves_b):
        assert pa == pb
        np.testing.assert_array_equal(la, lb)


def test_npz_export_reload_and_load_clip(torch_clip_archives):
    """save_npz -> load_npz roundtrip, and load_clip on both formats."""
    import jax

    model, jit_path, _, tmp = torch_clip_archives
    arch, params = convert_state_dict(load_torch_checkpoint(jit_path))
    npz_path = tmp / "tiny_clip.npz"
    save_npz(params, str(npz_path))

    tree = load_npz(str(npz_path))
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(tree),
    ):
        assert pa == pb
        np.testing.assert_array_equal(la, lb)

    # load_clip dispatches on extension and infers the arch for .npz
    arch_pt, _, params_pt = load_clip(jit_path)
    arch_npz, _, params_npz = load_clip(str(npz_path))
    assert arch_pt.name == arch_npz.name == TINY_TEST.name
    np.testing.assert_array_equal(
        params_pt["params"]["logit_scale"], params_npz["params"]["logit_scale"]
    )


def test_runtime_loads_clip_ckpt(torch_clip_archives):
    """ClipRuntime(CLIP_CKPT=...) really runs on the converted weights: its
    encodings differ from the random-init runtime and match the flax params
    loaded from the archive."""
    import jax

    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.runtime import ClipRuntime

    model, jit_path, _, tmp = torch_clip_archives
    arch, params = convert_state_dict(_numpy_sd(model))
    npz_path = tmp / "rt_clip.npz"
    save_npz(params, str(npz_path))

    cfg = Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=8, CLIP_CKPT=str(npz_path),
        COMPUTE_DTYPE="float32",
    )
    rt = ClipRuntime(cfg)
    assert rt.arch.name == TINY_TEST.name
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(jax.device_get(rt.params)),
    ):
        assert pa == pb
        np.testing.assert_allclose(la, np.asarray(lb, np.float32), rtol=0, atol=0)


def test_workflow_runs_on_converted_checkpoint(
    torch_clip_archives, tmp_path, mnist_fixture
):
    """End-to-end REPRODUCE.md step 1: a CLI workflow with CLIP_CKPT set runs
    zero-shot eval on the converted TorchScript weights."""
    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.runners import main_clip

    model, jit_path, _, tmp = torch_clip_archives
    arch, params = convert_state_dict(_numpy_sd(model))
    npz_path = tmp / "wf_clip.npz"
    save_npz(params, str(npz_path))

    root, classes = mnist_fixture
    cfg = Config(
        DATASET_NAME="MNIST", DATASET_DIR=str(root.parent),
        MODEL="clip_baseline", MODALITY="text", VIS_ENCODER="tiny-test",
        LEARNING_PARADIGM="ssl", PROMPT_TEMPLATE="a photo of a {}",
        BATCH_SIZE=8, OPTIM_SEED=1, SPLIT_SEED=500,
        ARTIFACT_DIR=str(tmp_path), CLIP_CKPT=str(npz_path),
    )
    resp = main_clip.workflow(cfg.DATASET_DIR, cfg)
    assert 0.0 <= resp[0] <= 1.0
    results = tmp_path / "results_model_clip_baseline.json"
    rec = json.loads(results.read_text().splitlines()[0])
    assert rec["config"]["CLIP_CKPT"] == str(npz_path)


def test_convert_cli_module(torch_clip_archives):
    """The literal REPRODUCE.md command:
    `python -m menghini_neurips23_tpu.models.convert in.pt out.npz`."""
    import os
    import subprocess
    import sys

    model, jit_path, _, tmp = torch_clip_archives
    out = tmp / "cli_out.npz"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "menghini_neurips23_tpu.models.convert",
         jit_path, str(out)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    assert "tiny-test" in proc.stdout
    tree = load_npz(str(out))
    _, expect = convert_state_dict(_numpy_sd(model))
    np.testing.assert_array_equal(
        tree["params"]["logit_scale"], expect["params"]["logit_scale"]
    )
