"""The standalone inference CLI (menghini_neurips23_tpu.predict): classify a
directory of images with saved prompt artifacts, or zero-shot."""

import json

import numpy as np
import pytest

from menghini_neurips23_tpu import predict
from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.data import dataset_object
from menghini_neurips23_tpu.evaluation import save_parameters
from menghini_neurips23_tpu.training import TextualStrategy

from tests.conftest import make_mnist_fixture


@pytest.fixture(scope="module")
def pred_env(tmp_path_factory, tiny_runtime):
    tmp = tmp_path_factory.mktemp("pred")
    root = tmp / "data" / "MNIST"
    make_mnist_fixture(root, n_per_class=4)
    classes = ["0", "1", "2"]
    l2i = {c: i for i, c in enumerate(classes)}
    art = tmp / "artifacts"
    art.mkdir()
    cfg = Config(
        VIS_ENCODER="tiny-test", MODEL="textual_prompt", DATASET_NAME="MNIST",
        DATASET_DIR=str(tmp / "data"), LEARNING_PARADIGM="ssl",
        EPOCHS=4, BATCH_SIZE=8, PREFIX_SIZE=4, LR=0.5, WARMUP_EPOCHS=1,
        OPTIM_SEED=1, SPLIT_SEED=500, ARTIFACT_DIR=str(art),
        PROMPT_TEMPLATE="a photo of a {}",
    )
    DS = dataset_object("MNIST")
    files = [f"train/{c}/{c}_img{i}.png" for c in classes for i in range(4)]
    labs = [c for c in classes for i in range(4)]
    train = DS(files[:9], str(root), train=True, labels=labs[:9], label_map=l2i)
    val = DS(files[9:], str(root), train=True, labels=labs[9:], label_map=l2i)
    strat = TextualStrategy(cfg, l2i, classes, classes, classes, runtime=tiny_runtime)
    _, params = strat.train(train, val, only_seen=True)
    save_parameters(params, cfg)

    yml = tmp / "pred.yml"
    yml.write_text(
        "\n".join(
            f"{k}: {v}"
            for k, v in dict(
                MODALITY="text", PREFIX_SIZE=4, ARTIFACT_DIR=str(art),
            ).items()
        )
        + "\n"
    )
    env = dict(
        OPTIM_SEED="1", SPLIT_SEED="500", VIS_ENCODER="tiny-test",
        DATASET_NAME="MNIST", DATASET_DIR=str(tmp / "data"),
        MODEL="textual_prompt",
    )
    return tmp, root, yml, env


def test_predict_with_saved_prompts(pred_env, tmp_path, monkeypatch):
    tmp, root, yml, env = pred_env
    monkeypatch.chdir(tmp / "artifacts")  # artifact-relative run dir
    out_file = tmp_path / "preds.json"
    preds = predict.main(
        [
            "--model_config", str(yml), "--learning_paradigm", "ssl",
            "--images", str(root / "test"), "--output", str(out_file),
            "--top_k", "2",
        ],
        env=env,
    )
    assert len(preds) == 12  # 3 classes x 4 test images
    payload = json.loads(out_file.read_text())
    assert payload["model"] == "textual_prompt"
    for p in payload["predictions"]:
        assert p["class"] in ("0", "1", "2")
        assert 0.0 <= p["confidence"] <= 1.0
        assert len(p["top_k"]) == 2
        assert p["top_k"][0]["confidence"] >= p["top_k"][1]["confidence"]


def test_predict_zero_shot_baseline(pred_env, monkeypatch):
    tmp, root, yml, env = pred_env
    monkeypatch.chdir(tmp)
    env = dict(env, MODEL="clip_baseline")
    preds = predict.main(
        [
            "--model_config", str(yml), "--learning_paradigm", "ssl",
            "--images", str(root / "test" / "0" / "0_img0.png"),
        ],
        env=env,
    )
    assert len(preds) == 1 and preds[0]["class"] in ("0", "1", "2")


def test_predict_missing_images_errors(pred_env):
    tmp, root, yml, env = pred_env
    with pytest.raises(FileNotFoundError):
        predict.main(
            ["--model_config", str(yml), "--learning_paradigm", "ssl",
             "--images", str(tmp / "nope")],
            env=env,
        )


def test_collect_images_empty_and_missing_txt(tmp_path):
    from menghini_neurips23_tpu.predict import collect_images
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="does not exist"):
        collect_images(str(tmp_path / "missing.txt"))
    empty = tmp_path / "empty.txt"
    empty.write_text("\n\n")
    with _pytest.raises(FileNotFoundError, match="is empty"):
        collect_images(str(empty))
