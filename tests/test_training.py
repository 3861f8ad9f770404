"""End-to-end training smoke tests on the tiny CLIP + synthetic MNIST-layout
dataset, exercising all three modalities, FPL merging, and GRIP iteration."""

import numpy as np
import pytest

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.data import dataset_object, sample_few_shots
from menghini_neurips23_tpu.training import (
    MultimodalStrategy,
    TextualStrategy,
    VisualStrategy,
)


def _build_config(tmp_path, **kw):
    base = dict(
        DATASET_NAME="MNIST",
        VIS_ENCODER="tiny-test",
        LEARNING_PARADIGM="ssl",
        MODEL="textual_prompt",
        MODALITY="text",
        PROMPT_TEMPLATE="a photo of a {}",
        BATCH_SIZE=8,
        EPOCHS=2,
        PREFIX_SIZE=4,
        TEXT_PREFIX_SIZE=2,
        VISION_PREFIX_SIZE=2,
        TRANSFORMER_DIM=16,
        N_PSEUDOSHOTS=2,
        N_LABEL=2,
        OPTIM_SEED=1,
        SPLIT_SEED=500,
        LR=0.01,
        ARTIFACT_DIR=str(tmp_path),
    )
    base.update(kw)
    return Config(**base)


def _datasets(mnist_fixture, classes_override=None):
    root, classes = mnist_fixture
    label_to_idx = {c: i for i, c in enumerate(classes)}
    DS = dataset_object("MNIST")
    # few-shot labeled train/val + unlabeled pool from the train split
    files, labs = [], []
    for c in classes:
        for i in range(6):
            files.append(f"train/{c}/{c}_img{i}.png")
            labs.append(c)
    few_files, few_labs = sample_few_shots(files, labs, classes, 2, seed=0)
    rest = [(f, l) for f, l in zip(files, labs) if f not in few_files]
    train = DS(few_files[: len(few_files) * 4 // 5], str(root), train=True,
               labels=few_labs[: len(few_labs) * 4 // 5], label_map=label_to_idx)
    val = DS(few_files[len(few_files) * 4 // 5 :], str(root), train=True,
             labels=few_labs[len(few_labs) * 4 // 5 :], label_map=label_to_idx)
    unlabeled = DS([f for f, _ in rest], str(root), train=True, labels=None,
                   label_map=label_to_idx)
    test_files = [f"test/{c}/{c}_img{i}.png" for c in classes for i in range(6)]
    test = DS(test_files, str(root), train=False, labels=None, label_map=label_to_idx)
    # MNIST dataset rule: filepaths are root/<f> (train=True only used by base)
    return classes, label_to_idx, train, val, unlabeled, test


def _strategy(cls, cfg, classes, label_to_idx, runtime, root, unlabeled=None):
    return cls(
        cfg,
        label_to_idx,
        classes,
        classes,
        classes,
        data_folder=str(root),
        unlabeled_files=[f.split("/")[-1] for f in (unlabeled.filepaths if unlabeled else [])],
        runtime=runtime,
    )


def test_textual_prompt_training(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    cfg = _build_config(tmp_path)
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root)
    before = np.asarray(strat.prefix).copy()
    acc, params = strat.train(train, val, only_seen=True)
    assert 0.0 <= acc <= 1.0
    assert len(params) == 1 and params[0].shape == before.shape
    assert np.abs(np.asarray(strat.prefix) - before).max() > 0  # it trained
    df = strat.test_predictions(test, standard_zsl=False)
    assert set(df.columns) == {"id", "class"}
    assert len(df) == len(test.filepaths)
    images, preds, logits = strat.evaluation(test)
    assert len(images) == len(preds) == logits.shape[0]
    assert logits.shape[1] == len(classes)


def test_textual_fpl_training(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    cfg = _build_config(tmp_path, MODEL="textual_fpl")
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
    n_labeled_before = len(train.filepaths)
    acc, params = strat.train(train, val, unlabeled, only_seen=False)
    # merged training set = pseudolabels + labeled
    assert len(train.filepaths) > n_labeled_before
    assert train.label_id is True
    # ssl loss policy: w0 = balance = n_pseudo/n_labeled, w1 = 1
    assert strat._w1 == 1.0
    assert strat.balance_param == pytest.approx(strat._w0)
    assert 0.0 <= acc <= 1.0
    # pseudolabel cache written with the reference naming scheme
    import glob

    assert glob.glob(str(tmp_path / "pseudolabels" / "MNIST_*textual_fpl*_pseudolabels_split_500.pickle"))


def test_visual_prompt_training(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    cfg = _build_config(tmp_path, MODEL="visual_prompt", MODALITY="image")
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(VisualStrategy, cfg, classes, l2i, tiny_runtime, root)
    before = np.asarray(strat.prefix).copy()
    acc, params = strat.train(train, val, only_seen=True)
    assert np.abs(np.asarray(strat.prefix) - before).max() > 0
    df = strat.test_predictions(test, standard_zsl=True)
    assert len(df) == len(test.filepaths)


def test_multimodal_prompt_training(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    cfg = _build_config(tmp_path, MODEL="multimodal_prompt", MODALITY="multi")
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(MultimodalStrategy, cfg, classes, l2i, tiny_runtime, root)
    before = np.asarray(strat.upt_params["coop"]).copy()
    acc, params = strat.train(train, val, only_seen=True)
    assert np.abs(np.asarray(strat.upt_params["coop"]) - before).max() > 0
    assert len(params) == 8  # reference multimodal artifact order
    assert params[6] is None  # deep_vpt unused
    # roundtrip through load_parameters
    strat.load_parameters(params)
    df = strat.test_predictions(test)
    assert len(df) == len(test.filepaths)


def test_grip_iterative_training(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    cfg = _build_config(
        tmp_path, MODEL="grip_textual", STEP_QUANTILE=50, EPOCHS=1, N_PSEUDOSHOTS=2
    )
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
    acc, params = strat.grip_train(train, val, unlabeled)
    assert 0.0 <= acc <= 1.0
    # per-iteration artifacts saved (2 iterations at STEP_QUANTILE=50)
    import glob

    prompts = glob.glob(str(tmp_path / "trained_prompts" / "*iter_*"))
    pseudos = glob.glob(str(tmp_path / "pseudolabels" / "*iter_*"))
    assert len(prompts) == 2
    assert len(pseudos) == 2


def test_ul_paradigm_trains_on_pseudo_only(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    cfg = _build_config(tmp_path, MODEL="textual_fpl", LEARNING_PARADIGM="ul")
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
    merged = strat.create_training_dataset(train, unlabeled)
    # UL: training set contains only pseudolabeled files (reference
    # unsupervised_learning/textual_fpl.py:106-108)
    assert all(g == 0 for g in strat._train_groups)
    assert merged.label_id is True
    assert len(merged.filepaths) <= cfg.N_PSEUDOSHOTS * len(classes)


def test_trzsl_loss_policy(tmp_path, mnist_fixture, tiny_runtime):
    root, classes_all = mnist_fixture
    cfg = _build_config(tmp_path, MODEL="textual_fpl", LEARNING_PARADIGM="trzsl")
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    seen, unseen = classes[:2], classes[2:]
    strat = TextualStrategy(
        cfg, l2i, classes, seen, unseen,
        data_folder=str(root),
        unlabeled_files=[f.split("/")[-1] for f in unlabeled.filepaths],
        runtime=tiny_runtime,
    )
    # restrict labeled data to seen classes as the TRZSL driver does
    keep = [i for i, l in enumerate(train.labels) if l in seen]
    train.filepaths = [train.filepaths[i] for i in keep]
    train.labels = [train.labels[i] for i in keep]
    merged = strat.create_training_dataset(train, unlabeled)
    # trzsl: w0=1, w1=balance=Ns/Nu (reference trzsl/textual_fpl.py:109-122)
    assert strat._w0 == 1.0
    assert strat._w1 == pytest.approx(strat.balance_param)
    n_pseudo = sum(strat._train_groups)
    n_seen = len(strat._train_groups) - n_pseudo
    assert strat.balance_param == pytest.approx(n_seen / n_pseudo)


def test_bfloat16_compute_dtype_smoke(tmp_path, mnist_fixture):
    """COMPUTE_DTYPE=bfloat16 trains end to end (bf16 matmuls, fp32 LN/softmax)."""
    from menghini_neurips23_tpu.runtime import ClipRuntime

    root, _ = mnist_fixture
    cfg = _build_config(tmp_path, COMPUTE_DTYPE="bfloat16", EPOCHS=2)
    rt = ClipRuntime(cfg)
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, rt, root)
    acc, params = strat.train(train, val, only_seen=True)
    assert 0.0 <= acc <= 1.0
    assert np.isfinite(params[0]).all()


def test_iterative_fpl_training(tmp_path, mnist_fixture, tiny_runtime):
    """IFPL: fixed N_PSEUDOSHOTS across iterations (unlike GRIP's growth)."""
    root, _ = mnist_fixture
    cfg = _build_config(
        tmp_path, MODEL="iterative_textual_fpl", STEP_QUANTILE=50, EPOCHS=1,
        N_PSEUDOSHOTS=2,
    )
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
    acc, params = strat.fixed_iterative_train(train, val, unlabeled)
    assert 0.0 <= acc <= 1.0
    assert cfg.N_PSEUDOSHOTS == 2  # IFPL never grows the budget
    import glob

    assert len(glob.glob(str(tmp_path / "trained_prompts" / "*iter_*"))) == 2


def test_visual_fpl_training(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    cfg = _build_config(tmp_path, MODEL="visual_fpl", MODALITY="image")
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(VisualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
    acc, params = strat.train(train, val, unlabeled, only_seen=False)
    assert 0.0 <= acc <= 1.0
    assert train.label_id is True


def test_multimodal_fpl_training(tmp_path, mnist_fixture, tiny_runtime):
    root, _ = mnist_fixture
    cfg = _build_config(tmp_path, MODEL="multimodal_fpl", MODALITY="multi")
    classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
    strat = _strategy(MultimodalStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
    acc, params = strat.train(train, val, unlabeled, only_seen=False)
    assert 0.0 <= acc <= 1.0
    # multimodal SSL uses sqrt-balance (reference multimodal_fpl.py:107)
    import math

    n_pseudo = sum(strat._train_groups)
    n_lab = len(strat._train_groups) - n_pseudo
    assert strat._w0 == pytest.approx(math.sqrt(n_pseudo / n_lab))


def test_model_dispatch_covers_all_reference_variants(tiny_runtime, tmp_path):
    """Every MODEL name the reference drivers dispatch must build a strategy."""
    from menghini_neurips23_tpu.runners.common import MODEL_DISPATCH, build_strategy

    expected = {
        "textual_prompt", "visual_prompt", "multimodal_prompt",
        "textual_fpl", "visual_fpl", "multimodal_fpl",
        "iterative_textual_fpl", "iterative_visual_fpl", "iterative_multimodal_fpl",
        "grip_textual", "grip_visual", "grip_multimodal",
    }
    assert set(MODEL_DISPATCH) == expected
    classes = ["a", "b"]
    l2i = {"a": 0, "b": 1}
    dc = {"classes": classes, "seen_classes": classes, "unseen_classes": classes}
    for model in expected:
        cfg = _build_config(tmp_path, MODEL=model)
        strat, method = build_strategy(cfg, l2i, dc, "/tmp", runtime=tiny_runtime)
        assert method in {"train", "train_fpl", "fixed_iterative_train", "grip_train"}
        assert strat.MODALITY == cfg.MODALITY
