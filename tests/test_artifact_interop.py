"""Artifact interop with the reference's torch formats.

Synthetic reference-format files (pickled torch tensor lists; torch.save .pt
state_dicts + numpy pickles for multimodal - reference
utils/compute_metrics.py:105-147 layout) must load into our strategies, and
ARTIFACT_FORMAT="torch" must write files the reference tooling would read,
roundtripping losslessly.
"""

import pickle

import numpy as np
import pytest
import torch

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.evaluation.persist import (
    MULTI_PART_NAMES,
    _prompt_file_name,
    load_saved_parameters,
    save_parameters,
)


def _cfg(tmp_path, **kw):
    base = dict(
        DATASET_NAME="MNIST", VIS_ENCODER="ViT-B/32", MODEL="textual_prompt",
        LEARNING_PARADIGM="ssl", OPTIM_SEED=1, SPLIT_SEED=500,
        ARTIFACT_DIR=str(tmp_path),
    )
    base.update(kw)
    return Config(**base)


def test_load_reference_textual_artifact(tmp_path):
    """A reference-produced prompt pickle (list of torch tensors) loads as
    numpy through load_saved_parameters."""
    cfg = _cfg(tmp_path)
    prefix = torch.randn(16, 512)
    path = _prompt_file_name(cfg)
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump([prefix], f)  # reference: pickled torch tensor list
    out = load_saved_parameters(cfg)
    assert isinstance(out[0], np.ndarray)
    np.testing.assert_array_equal(out[0], prefix.numpy())


def test_write_torch_format_textual_roundtrip(tmp_path):
    cfg = _cfg(tmp_path, ARTIFACT_FORMAT="torch")
    params = [np.random.default_rng(0).normal(size=(16, 512)).astype(np.float32)]
    save_parameters(params, cfg)
    # the file is literally a pickled list of torch tensors, carrying the
    # BATCHED (1, L, W) prefix the reference's TextPrefixModel holds - the
    # only rank CustomTextEncoder.forward executes on (reference
    # clip_encoders.py:55-67), so reference tooling can load our artifact
    with open(_prompt_file_name(cfg), "rb") as f:
        raw = pickle.load(f)
    assert isinstance(raw[0], torch.Tensor)
    assert raw[0].shape == (1, 16, 512)
    np.testing.assert_array_equal(raw[0].numpy()[0], params[0])
    # and loads back through our reader (strategies squeeze the leading axis,
    # TextualStrategy.load_parameters)
    out = load_saved_parameters(cfg)
    np.testing.assert_array_equal(np.asarray(out[0])[0], params[0])


def _synthetic_multi_params(rng, dim=16, L=2):
    """Our multimodal epoch_parameters layout (flax subtrees + numpy)."""
    def dense(i, o):
        return {
            "kernel": rng.normal(size=(i, o)).astype(np.float32),
            "bias": rng.normal(size=(o,)).astype(np.float32),
        }

    block = {
        "ln_1": {"scale": np.ones(dim, np.float32), "bias": np.zeros(dim, np.float32)},
        "ln_2": {"scale": np.ones(dim, np.float32), "bias": np.zeros(dim, np.float32)},
        "attn": {
            "in_proj_kernel": rng.normal(size=(dim, 3 * dim)).astype(np.float32),
            "in_proj_bias": rng.normal(size=(3 * dim,)).astype(np.float32),
            "out_proj": dense(dim, dim),
        },
        "c_fc": dense(dim, 4 * dim),
        "c_proj": dense(4 * dim, dim),
    }
    return [
        {"resblocks_0": block},
        dense(32, dim), dense(dim, 32), dense(48, dim), dense(dim, 48),
        rng.normal(size=(L, 32)).astype(np.float32),
        None,
        rng.normal(size=(L, 48)).astype(np.float32),
    ]


def _assert_tree_equal(a, b):
    if a is None:
        assert b is None
        return
    if isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            _assert_tree_equal(a[k], b[k])
        return
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multimodal_torch_format_roundtrip(tmp_path):
    """torch-format write (5 .pt state_dicts + 3 pickles) roundtrips through
    our loader back to the exact flax subtrees."""
    rng = np.random.default_rng(1)
    params = _synthetic_multi_params(rng)
    cfg = _cfg(tmp_path, MODEL="multimodal_prompt", MODALITY="multi",
               ARTIFACT_FORMAT="torch")
    save_parameters(params, cfg)

    base = _prompt_file_name(cfg).rsplit(".", 1)[0]
    import os

    # the reference's exact file split: .pt for the 5 module parts
    for name in MULTI_PART_NAMES[:5]:
        assert os.path.exists(f"{base}_{name}.pt"), name
        assert not os.path.exists(f"{base}_{name}.pickle"), name
    for name in MULTI_PART_NAMES[5:]:
        assert os.path.exists(f"{base}_{name}.pickle"), name
    # the transformer .pt is a torch state_dict with reference key names
    sd = torch.load(f"{base}_{MULTI_PART_NAMES[0]}.pt", weights_only=False)
    assert "resblocks.0.attn.in_proj_weight" in sd
    assert isinstance(sd["resblocks.0.attn.in_proj_weight"], torch.Tensor)
    # in_proj_weight is (3W, W) = our kernel transposed
    np.testing.assert_array_equal(
        sd["resblocks.0.attn.in_proj_weight"].numpy(),
        params[0]["resblocks_0"]["attn"]["in_proj_kernel"].T,
    )

    out = load_saved_parameters(cfg)
    for ours, loaded in zip(params, out):
        _assert_tree_equal(ours, loaded)


def test_multimodal_numpy_format_still_roundtrips(tmp_path):
    rng = np.random.default_rng(2)
    params = _synthetic_multi_params(rng)
    cfg = _cfg(tmp_path, MODEL="multimodal_prompt", MODALITY="multi")
    save_parameters(params, cfg)
    out = load_saved_parameters(cfg)
    for ours, loaded in zip(params, out):
        _assert_tree_equal(ours, loaded)


def test_multimodal_loads_into_strategy(tmp_path, tiny_runtime):
    """A reference-format multimodal artifact loads through load_model_eval
    into a working MultimodalStrategy."""
    from menghini_neurips23_tpu.training import MultimodalStrategy

    cfg = Config(
        DATASET_NAME="MNIST", VIS_ENCODER="tiny-test", MODEL="multimodal_prompt",
        LEARNING_PARADIGM="ssl", MODALITY="multi", TEXT_PREFIX_SIZE=2,
        VISION_PREFIX_SIZE=2, TRANSFORMER_DIM=16, ARTIFACT_DIR=str(tmp_path),
        ARTIFACT_FORMAT="torch", PROMPT_TEMPLATE="a photo of a {}",
    )
    classes = ["0", "1", "2"]
    l2i = {c: i for i, c in enumerate(classes)}
    strat = MultimodalStrategy(cfg, l2i, classes, classes, classes, runtime=tiny_runtime)
    before = strat.epoch_parameters()
    save_parameters(before, cfg)  # torch format on disk
    # perturb then restore from the torch-format artifact
    strat.initialize_prompts_parameters()
    strat.load_model_eval()
    after = strat.epoch_parameters()
    for a, b in zip(before, after):
        _assert_tree_equal(a, b)


def test_multimodal_torch_format_uses_reference_rank(tmp_path):
    """torch-format coop/vpt embedding pickles carry the reference's BATCHED
    (1, L, W) rank (UPTModel sizes itself via size()[1]/[2], reference
    prompts_models.py:88-95), and both ranks load back to our (L, W)."""
    rng = np.random.default_rng(3)
    params = _synthetic_multi_params(rng)
    cfg = _cfg(tmp_path, MODEL="multimodal_prompt", MODALITY="multi",
               ARTIFACT_FORMAT="torch")
    save_parameters(params, cfg)
    base = _prompt_file_name(cfg).rsplit(".", 1)[0]
    for idx, name in ((5, MULTI_PART_NAMES[5]), (7, MULTI_PART_NAMES[7])):
        with open(f"{base}_{name}.pickle", "rb") as f:
            raw = pickle.load(f)
        assert raw.shape == (1,) + params[idx].shape, name
    out = load_saved_parameters(cfg)
    for ours, loaded in zip(params, out):
        _assert_tree_equal(ours, loaded)


def test_reference_rank_multimodal_loads_into_strategy(tmp_path, tiny_runtime):
    """A reference-produced artifact (batched coop/vpt embeddings) loads into
    a WORKING MultimodalStrategy - the UPT mixer runs on the squeezed (L, W)
    rank (round-3 review fix: it previously crashed inside UPTMixer)."""
    from menghini_neurips23_tpu.training import MultimodalStrategy

    cfg = Config(
        DATASET_NAME="MNIST", VIS_ENCODER="tiny-test", MODEL="multimodal_prompt",
        LEARNING_PARADIGM="ssl", TEXT_PREFIX_SIZE=2, VISION_PREFIX_SIZE=2,
        TRANSFORMER_DIM=16, OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
    )
    classes = ["0", "1", "2"]
    l2i = {c: i for i, c in enumerate(classes)}
    strat = MultimodalStrategy(cfg, l2i, classes, classes, classes,
                               runtime=tiny_runtime)
    parts = strat.epoch_parameters()
    ref_rank = list(parts)
    ref_rank[5] = np.asarray(parts[5])[None]  # reference batched rank
    ref_rank[7] = np.asarray(parts[7])[None]
    strat.load_parameters(ref_rank)
    assert np.asarray(strat.upt_params["coop"]).ndim == 2
    # the prompted towers actually run on the loaded params
    import tempfile, pathlib
    from tests.conftest import make_mnist_fixture

    root = pathlib.Path(tempfile.mkdtemp()) / "MNIST"
    make_mnist_fixture(root, n_per_class=2)
    files = [str(root / "train" / c / f"{c}_img0.png") for c in classes]
    logits = strat._predict_logits(files, classes)
    assert logits.shape == (3, 3) and np.isfinite(logits).all()
