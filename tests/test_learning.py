"""Prompt tuning actually LEARNS: on the color-separable synthetic dataset,
trained prompts must reach high accuracy even with a random frozen CLIP
(the frozen towers are random but fixed; the prompts align text/image
features to the separable structure)."""

import numpy as np
import pytest

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.data import dataset_object
from menghini_neurips23_tpu.training import TextualStrategy, VisualStrategy

from tests.conftest import make_mnist_fixture


@pytest.fixture(scope="module")
def learn_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("learn") / "MNIST"
    make_mnist_fixture(root, n_per_class=10)
    classes = ["0", "1", "2"]
    l2i = {c: i for i, c in enumerate(classes)}
    DS = dataset_object("MNIST")
    files = [f"train/{c}/{c}_img{i}.png" for c in classes for i in range(10)]
    labs = [c for c in classes for i in range(10)]
    train = DS(files[:24], str(root), train=True, labels=labs[:24], label_map=l2i)
    val = DS(files[24:], str(root), train=True, labels=labs[24:], label_map=l2i)
    return root, classes, l2i, train, val


@pytest.mark.parametrize(
    "name,cls,extra",
    [
        ("textual", TextualStrategy, {}),
        ("visual", VisualStrategy, {"MODALITY": "image"}),
    ],
)
def test_prompt_tuning_learns(learn_data, tiny_runtime, name, cls, extra):
    root, classes, l2i, train, val = learn_data
    cfg = Config(
        VIS_ENCODER="tiny-test", EPOCHS=25, BATCH_SIZE=8, LR=0.5, WARMUP_EPOCHS=2,
        PREFIX_SIZE=4, OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
        MODEL=f"{name}_prompt", DATASET_NAME="MNIST", LEARNING_PARADIGM="ssl",
        **extra,
    )
    strat = cls(cfg, l2i, classes, classes, classes, runtime=tiny_runtime)
    best_val, params = strat.train(train, val, only_seen=True)
    logits = strat._predict_logits(train.filepaths, classes)
    train_acc = (logits.argmax(1) == np.array(train.label_ids())).mean()
    assert train_acc >= 0.9, f"{name} failed to fit: train_acc={train_acc}"
    assert best_val >= 0.66, f"{name} failed to generalize: val={best_val}"
