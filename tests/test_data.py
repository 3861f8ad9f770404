"""Data layer: path layouts, split RNG parity, image pipeline."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from menghini_neurips23_tpu.data import (
    dataset_object,
    format_prompt,
    get_class_names,
    get_labeled_and_unlabeled_data,
    iter_image_batches,
    load_image,
    normalize_images,
    sample_few_shots,
    train_val_split,
)


# ---------------------------------------------------------------------------
# Split RNG parity: identical np.random call sequences to the reference
# ---------------------------------------------------------------------------
def test_62pct_split_parity(tmp_path):
    classes = [f"class{i}" for i in range(10)]
    d = tmp_path / "EuroSAT"
    d.mkdir()
    (d / "class_names.txt").write_text("\n".join(classes) + "\n")
    got_classes, seen, unseen = get_class_names("EuroSAT", str(tmp_path), seed=500)
    assert got_classes == classes
    # independent replication of reference prepare_data.py:92-99
    np.random.seed(500)
    seen_idx = np.random.choice(range(10), size=int(10 * 0.62), replace=False)
    unseen_idx = list(set(range(10)).difference(set(seen_idx)))
    assert seen == list(np.array(classes)[seen_idx])
    assert unseen == list(np.array(classes)[unseen_idx])
    assert len(seen) == 6


def test_train_val_split_parity():
    files = [f"f{i}" for i in range(100)]
    labels = [f"c{i % 5}" for i in range(100)]
    tr_f, tr_l, va_f, va_l = train_val_split(files, labels, 0.8, seed=0)
    np.random.seed(0)
    tr_idx = np.random.choice(range(100), size=80, replace=False)
    va_idx = list(set(range(100)).difference(set(tr_idx)))
    assert list(tr_f) == list(np.array(files)[tr_idx])
    assert list(va_f) == list(np.array(files)[va_idx])
    assert list(tr_l) == list(np.array(labels)[tr_idx])
    assert list(va_l) == list(np.array(labels)[va_idx])


def test_few_shot_sampling_parity():
    """np.random.seed must be re-applied inside the class loop (reference
    main_SSL.py:105-111) - this quirk changes which samples are selected."""
    files = np.array([f"f{i}" for i in range(60)])
    labels = np.array(["a"] * 20 + ["b"] * 20 + ["c"] * 20)
    got_f, got_l = sample_few_shots(files, labels, ["a", "b", "c"], 2, seed=0)
    exp_f, exp_l = [], []
    for c in ["a", "b", "c"]:
        np.random.seed(0)
        idx = np.random.choice(np.where(labels == c)[0], size=2, replace=False)
        exp_f += list(files[idx])
        exp_l += list(labels[idx])
    assert got_f == exp_f
    assert got_l == exp_l


# ---------------------------------------------------------------------------
# Dataset path layouts
# ---------------------------------------------------------------------------
def test_eurosat_layout():
    DS = dataset_object("EuroSAT")
    ds = DS(["River_1.jpg", "Forest_2.jpg"], "/data/EuroSAT", train=True)
    assert ds.filepaths == [
        "/data/EuroSAT/River/River_1.jpg",
        "/data/EuroSAT/Forest/Forest_2.jpg",
    ]


def test_resics_layout():
    DS = dataset_object("RESICS45")
    ds = DS(["golf_course_001.jpg"], "/d/RESICS45", train=True)
    assert ds.filepaths == ["/d/RESICS45/golf_course/golf_course_001.jpg"]


def test_split_relative_layout():
    DS = dataset_object("Flowers102")
    ds = DS(["train/image_1.jpg"], "/d/F", train=True)
    assert ds.filepaths == ["/d/F/train/image_1.jpg"]


def test_class_folder_lookup_preserves_original_order():
    """class_folder mode re-resolves basenames against original paths in
    ORIGINAL order (reference data/dataset.py:296-307)."""
    DS = dataset_object("MNIST")
    originals = ["/d/M/train/3/img2.png", "/d/M/train/7/img1.png"]
    ds = DS(
        ["img1.png", "img2.png"],
        "/d/M",
        train=True,
        class_folder=True,
        original_filepaths=originals,
    )
    assert ds.filepaths == originals


def test_dtd_class_folder(tmp_path):
    root = tmp_path / "DTD"
    (root / "train" / "banded").mkdir(parents=True)
    (root / "val" / "banded").mkdir(parents=True)
    (root / "train" / "banded" / "banded_0001.jpg").write_bytes(b"")
    (root / "val" / "banded" / "banded_0002.jpg").write_bytes(b"")
    DS = dataset_object("DTD")
    ds = DS(
        ["banded_0001.jpg", "banded_0002.jpg"],
        str(root),
        train=True,
        class_folder=True,
    )
    assert ds.filepaths == [
        f"{root}/train/banded/banded_0001.jpg",
        f"{root}/val/banded/banded_0002.jpg",
    ]


def test_label_ids_mapping():
    DS = dataset_object("EuroSAT")
    ds = DS(
        ["River_1.jpg"],
        "/d/E",
        train=True,
        labels=["river"],
        label_map={"river": 3},
    )
    assert ds.label_ids() == [3]
    ds.labels = [7]
    ds.label_id = True
    assert ds.label_ids() == [7]


# ---------------------------------------------------------------------------
# ELEVATER index parsing (synthetic on-disk fixture)
# ---------------------------------------------------------------------------
def _make_mnist_fixture(tmp_path, n_per_class=4):
    root = tmp_path / "MNIST"
    root.mkdir()
    classes = ["0", "1", "2"]
    (root / "labels.txt").write_text("\n".join(classes) + "\n")
    train_lines, test_lines = [], []
    for c in classes:
        for split, lines in (("train", train_lines), ("test", test_lines)):
            d = root / split / c
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n_per_class):
                name = f"{c}/{c}_img{i}.png"
                Image.new("RGB", (28, 28), color=(int(c) * 40, 0, 0)).save(
                    root / split / name
                )
                lines.append(f"{name} {c}")
    (root / "train.txt").write_text("\n".join(train_lines) + "\n")
    (root / "test.txt").write_text("\n".join(test_lines) + "\n")
    return root, classes


def test_mnist_parsing(tmp_path):
    root, classes = _make_mnist_fixture(tmp_path)
    seen, unseen = ["0", "2"], ["1"]
    labeled, unlabeled, test = get_labeled_and_unlabeled_data(
        "MNIST", str(root), seen, unseen, classes
    )
    assert all(c in seen for _, c in labeled)
    assert all(c in unseen for _, c in unlabeled)
    assert len(labeled) == 8 and len(unlabeled) == 4 and len(test) == 12
    assert labeled[0][0].startswith("train/")
    assert test[0][0].startswith("test/")


def test_eurosat_parsing(tmp_path):
    root = tmp_path / "EuroSAT"
    for d in ("River", "Forest"):
        (root / d).mkdir(parents=True)
        for i in range(3):
            Image.new("RGB", (8, 8)).save(root / d / f"{d}_{i}.jpg")
    classes = ["river", "forest"]
    (root / "test.txt").write_text("x@River/River_0.jpg 0\nx@Forest/Forest_0.jpg 1\n")
    labeled, unlabeled, test = get_labeled_and_unlabeled_data(
        "EuroSAT", str(root), ["river"], ["forest"], classes
    )
    assert len(labeled) == 3 and len(unlabeled) == 3
    assert test == [("River_0.jpg", "river"), ("Forest_0.jpg", "forest")]


# ---------------------------------------------------------------------------
# Image pipeline
# ---------------------------------------------------------------------------
def test_load_image_resize_and_crop(tmp_path):
    p = tmp_path / "img.png"
    Image.new("RGB", (100, 60), color=(255, 0, 0)).save(p)
    out = load_image(str(p), 32)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.uint8
    assert out[0, 0, 0] == 255


def test_normalize_images():
    import jax.numpy as jnp

    u8 = np.full((2, 4, 4, 3), 128, np.uint8)
    x = np.asarray(normalize_images(jnp.asarray(u8)))
    from menghini_neurips23_tpu.data import CLIP_MEAN, CLIP_STD

    expected = (128 / 255.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(x[0, 0, 0], expected, rtol=1e-5)


def test_iter_image_batches_padding(tmp_path):
    paths = []
    for i in range(5):
        p = tmp_path / f"i{i}.png"
        Image.new("RGB", (8, 8), color=(i * 10, 0, 0)).save(p)
        paths.append(str(p))
    batches = list(
        iter_image_batches(paths, batch_size=2, resolution=8, labels=[0, 1, 2, 3, 4])
    )
    assert len(batches) == 3
    assert batches[-1].count == 1
    assert batches[-1].images.shape == (2, 8, 8, 3)
    assert batches[-1].labels[1] == -1  # padded
    # all valid indices covered exactly once
    idx = np.concatenate([b.index[: b.count] for b in batches])
    assert sorted(idx.tolist()) == [0, 1, 2, 3, 4]


def test_iter_image_batches_cache_and_shuffle():
    cache = np.arange(6 * 4 * 4 * 3, dtype=np.uint8).reshape(6, 4, 4, 3)
    paths = [f"p{i}" for i in range(6)]
    b1 = list(iter_image_batches(paths, 4, 4, cache=cache, shuffle=True, seed=1))
    b2 = list(iter_image_batches(paths, 4, 4, cache=cache, shuffle=True, seed=1))
    np.testing.assert_array_equal(b1[0].index, b2[0].index)  # deterministic
    idx = np.concatenate([b.index[: b.count] for b in b1])
    assert sorted(idx.tolist()) == list(range(6))
    np.testing.assert_array_equal(b1[0].images, cache[b1[0].index])


def test_format_prompt():
    assert format_prompt("a photo of a {}", "annual_crop") == "a photo of a annual crop"
    assert format_prompt("prefix ", "dog") == "prefix dog"


# ---------------------------------------------------------------------------
# Legacy dataset branches (aPY / AwA2)
# ---------------------------------------------------------------------------
def test_awa2_class_names_and_split(tmp_path):
    root = tmp_path / "Animals_with_Attributes2"
    root.mkdir()
    (root / "trainvalclasses.txt").write_text("grizzly+bear\nhorse\n")
    (root / "testclasses.txt").write_text("blue+whale\n")
    classes, seen, unseen = get_class_names("Animals_with_Attributes2", str(tmp_path))
    assert seen == ["grizzly bear", "horse"]
    assert unseen == ["blue whale"]
    for c, d in [("grizzly bear", "grizzly+bear"), ("horse", "horse"), ("blue whale", "blue+whale")]:
        (root / "JPEGImages" / d).mkdir(parents=True)
        for i in range(5):
            (root / "JPEGImages" / d / f"{d}_{i}.jpg").write_bytes(b"")
    labeled, unlabeled, test = get_labeled_and_unlabeled_data(
        "Animals_with_Attributes2", str(root), seen, unseen, classes
    )
    # 80/20 generic split (seed 500)
    assert len(labeled) == 8 and len(unlabeled) == 4
    assert len(test) == 2 + 1
    # split RNG parity with reference split_data (np.random.seed(500))
    np.random.seed(500)
    idx = np.random.choice(range(10), size=8, replace=False)
    files = [f for c, d in [("grizzly bear", "grizzly+bear"), ("horse", "horse")]
             for f in sorted(os.listdir(root / "JPEGImages" / d))]
    # os.listdir order is what the reference uses; just check count parity here
    assert len(idx) == len(labeled)


def test_apy_class_names(tmp_path):
    root = tmp_path / "aPY" / "proposed_split"
    root.mkdir(parents=True)
    (root / "trainvalclasses.txt").write_text("diningtable\ncat\n")
    (root / "testclasses.txt").write_text("jetski\n")
    classes, seen, unseen = get_class_names("aPY", str(tmp_path))
    assert seen == ["dining table", "cat"]
    assert unseen == ["jet ski"]


def test_bundled_class_files_fallback():
    """get_class_names falls back to the class files bundled with the package
    (same files the reference ships under data/class_files/) when DATASET_DIR
    has no copy - a real-data run needs only images + index files."""
    classes, seen, unseen = get_class_names("EuroSAT", "/nonexistent", seed=500)
    assert len(classes) == 10  # incl. the final no-newline line (wc shows 9)
    assert classes[0] == "annual crop land"
    assert sorted(seen + unseen) == sorted(classes)
    classes_m, _, _ = get_class_names("MNIST", "/nonexistent", seed=500)
    assert classes_m == [str(i) for i in range(10)]


def test_dataset_dir_class_file_wins_over_bundled(tmp_path):
    d = tmp_path / "MNIST"
    d.mkdir()
    (d / "labels.txt").write_text("a\nb\nc\n")
    classes, _, _ = get_class_names("MNIST", str(tmp_path), seed=500)
    assert classes == ["a", "b", "c"]


def test_bundled_split_jsons_match_regeneration():
    """The bundled data_splits JSONs are regenerated from the seeded RNG (and
    were verified set-equal to the reference's shipped JSONs); regeneration
    must stay bit-stable."""
    import json
    import os

    from menghini_neurips23_tpu.data.splits import generate_split_json

    split_dir = os.path.join(
        os.path.dirname(generate_split_json.__code__.co_filename), "data_splits"
    )
    for ds in ("EuroSAT", "DTD", "Flowers102", "FGVCAircraft", "MNIST", "RESICS45"):
        with open(os.path.join(split_dir, f"{ds}.json")) as f:
            bundled = json.load(f)
        assert generate_split_json(ds, "/nonexistent") == bundled, ds


def test_getitem_reference_surface(tmp_path):
    """Reference-compatible __getitem__: (img, aug1, aug2[, label], basename)
    with aug transforms falling back to the base transform (reference
    data/dataset.py:55-88)."""
    from PIL import Image

    d = tmp_path / "MNIST" / "train" / "0"
    d.mkdir(parents=True)
    Image.new("RGB", (8, 8), (10, 20, 30)).save(d / "img0.png")
    DS = dataset_object("MNIST")
    ds = DS(["train/0/img0.png"], str(tmp_path / "MNIST"), train=True,
            labels=["0"], label_map={"0": 0},
            transform=lambda im: "T", augmentations=[lambda im: "A1", None])
    img, a1, a2, label, name = ds[0]
    assert (img, a1, a2, label, name) == ("T", "A1", "T", 0, "img0.png")
    ds2 = DS(["train/0/img0.png"], str(tmp_path / "MNIST"), train=True,
             labels=None, label_map=None)
    img, a1, a2, name = ds2[0]
    assert name == "img0.png" and a1 is img and a2 is img
