"""Class-name and file-list preparation for the FRAMED datasets.

Host-side counterpart of reference utils/prepare_data.py.  The seeded NumPy
RNG calls are kept **bit-identical** to the reference (same seed placement,
same np.random.choice invocations) so seen/unseen class splits, few-shot
selections and train/val splits - and therefore accuracy comparisons - match
the PyTorch reference exactly (SURVEY.md hard part #3).
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence, Tuple

import numpy as np

FRAMED = ("EuroSAT", "DTD", "RESICS45", "FGVCAircraft", "MNIST", "Flowers102")

# EuroSAT class-name -> directory correction (reference prepare_data.py:287-298)
EUROSAT_DIRS = {
    "annual crop land": "AnnualCrop",
    "brushland or shrubland": "HerbaceousVegetation",
    "highway or road": "Highway",
    "industrial buildings or commercial buildings": "Industrial",
    "pasture land": "Pasture",
    "permanent crop land": "PermanentCrop",
    "residential buildings or homes or apartments": "Residential",
    "lake or sea": "SeaLake",
    "river": "River",
    "forest": "Forest",
}


def _read_lines(path: str) -> List[str]:
    with open(path, "r") as f:
        return [l.strip() for l in f if l.strip() or l == "\n"]


def _seeded_62pct_split(classes: Sequence[str], seed: int) -> Tuple[List[str], List[str]]:
    """62% seen / 38% unseen via np.random.choice - bit-identical to
    reference prepare_data.py:92-99 (same seed call, same argument forms)."""
    np.random.seed(seed)
    seen_indices = np.random.choice(
        range(len(classes)), size=int(len(classes) * 0.62), replace=False
    )
    unseen_indices = list(set(range(len(classes))).difference(set(seen_indices)))
    seen = list(np.array(classes)[seen_indices])
    unseen = list(np.array(classes)[unseen_indices])
    return seen, unseen


def get_class_names(dataset: str, dataset_dir: str, seed: int = 500):
    """Returns (classes, seen_classes, unseen_classes).

    Mirrors reference utils/prepare_data.py:12-206 for the FRAMED datasets
    (class list file per dataset + seeded 62% split).  CUB's fixed
    trainval/test class files are also supported (reference :187-204).
    """
    path = f"{dataset_dir}/{dataset}"
    if dataset in ("EuroSAT", "DTD", "Flowers102"):
        classes = _read_lines(f"{path}/class_names.txt")
    elif dataset in ("FGVCAircraft", "MNIST"):
        classes = _read_lines(f"{path}/labels.txt")
    elif dataset == "RESICS45":
        with open(f"{path}/train.json", "r") as f:
            data = json.load(f)
        classes = [d["name"].replace("_", " ") for d in data["categories"]]
    elif dataset == "CUB":
        seen_classes = [
            l.split(".")[-1].strip().replace("_", " ").lower()
            for l in _read_lines(f"{path}/trainvalclasses.txt")
        ]
        unseen_classes = [
            l.split(".")[-1].strip().replace("_", " ").lower()
            for l in _read_lines(f"{path}/testclasses.txt")
        ]
        return seen_classes + unseen_classes, seen_classes, unseen_classes
    else:
        raise ValueError(f"Unknown dataset {dataset!r}")

    seen, unseen = _seeded_62pct_split(classes, seed)
    return classes, seen, unseen


def get_labeled_and_unlabeled_data(
    dataset: str,
    data_folder: str,
    seen_classes: Sequence[str],
    unseen_classes: Sequence[str],
    classes: Sequence[str] | None = None,
):
    """Parse ELEVATER-style index files into (labeled, unlabeled, test) lists
    of (filename, classname).  Mirrors reference prepare_data.py:209-604 per
    dataset; 'labeled' covers seen classes, 'unlabeled' unseen classes.
    """
    if dataset == "EuroSAT":
        labeled, unlabeled = [], []
        for c in seen_classes:
            for f in os.listdir(f"{data_folder}/{EUROSAT_DIRS[c]}"):
                labeled.append((f, c))
        for c in unseen_classes:
            for f in os.listdir(f"{data_folder}/{EUROSAT_DIRS[c]}"):
                unlabeled.append((f, c))
        test = []
        with open(f"{data_folder}/test.txt", "r") as fh:
            for l in fh:
                line = l.split(" ")
                fname = line[0].strip().split("@")[-1].split("/")[-1]
                test.append((fname, classes[int(line[1].strip())]))
        return labeled, unlabeled, test

    if dataset == "DTD":
        labeled, unlabeled = [], []
        for split in ("train", "val"):
            with open(f"{data_folder}/{split}.txt", "r") as fh:
                for l in fh:
                    line = l.split(" ")
                    cl = classes[int(line[1].strip())]
                    entry = (f"{split}/{line[0].strip().split('@')[-1]}", cl)
                    if cl in seen_classes:
                        labeled.append(entry)
                    elif cl in unseen_classes:
                        unlabeled.append(entry)
                    else:
                        raise ValueError(f"class {cl} is neither seen nor unseen")
        test = []
        with open(f"{data_folder}/test.txt", "r") as fh:
            for l in fh:
                line = l.split(" ")
                test.append(
                    (f"test/{line[0].strip().split('@')[-1]}", classes[int(line[1].strip())])
                )
        return labeled, unlabeled, test

    if dataset == "RESICS45":
        labeled, unlabeled = [], []
        for split in ("train", "val"):
            with open(f"{data_folder}/{split}.json", "r") as fh:
                data = json.load(fh)
            for d in data["images"]:
                file_name = d["file_name"].split("@")[-1]
                cl = file_name.split("/")[0].replace("_", " ")
                img = file_name.split("/")[-1]
                if cl in seen_classes:
                    labeled.append((img, cl))
                elif cl in unseen_classes:
                    unlabeled.append((img, cl))
                else:
                    raise ValueError(f"class {cl} is neither seen nor unseen")
        test = []
        with open(f"{data_folder}/test.json", "r") as fh:
            data = json.load(fh)
        for d in data["images"]:
            file_name = d["file_name"].split("@")[-1]
            cl = file_name.split("/")[0].replace("_", " ")
            test.append((file_name.split("/")[-1], cl))
        return labeled, unlabeled, test

    if dataset == "FGVCAircraft":
        labeled, unlabeled = [], []
        for split in ("train", "val"):
            with open(f"{data_folder}/{split}.txt", "r") as fh:
                for l in fh:
                    img = " ".join(l.split(" ")[:-1]).split("@")[-1].strip()
                    cl = img.split("/")[0].strip()
                    if cl in seen_classes:
                        labeled.append((f"{split}/{img}", cl))
                    elif cl in unseen_classes:
                        unlabeled.append((f"{split}/{img}", cl))
                    else:
                        raise ValueError(f"class {cl} is neither seen nor unseen")
        test = []
        with open(f"{data_folder}/test.txt", "r") as fh:
            for l in fh:
                img = " ".join(l.split(" ")[:-1]).split("@")[-1].strip()
                test.append((f"test/{img}", img.split("/")[0].strip()))
        return labeled, unlabeled, test

    if dataset == "MNIST":
        labeled, unlabeled = [], []
        with open(f"{data_folder}/train.txt", "r") as fh:
            for l in fh:
                img = l.split(" ")[0].split("@")[-1].strip()
                cl = img.split("/")[0].strip()
                if cl in seen_classes:
                    labeled.append((f"train/{img}", cl))
                elif cl in unseen_classes:
                    unlabeled.append((f"train/{img}", cl))
                else:
                    raise ValueError(f"class {cl} is neither seen nor unseen")
        test = []
        with open(f"{data_folder}/test.txt", "r") as fh:
            for l in fh:
                img = l.split(" ")[0].split("@")[-1].strip()
                test.append((f"test/{img}", img.split("/")[0].strip()))
        return labeled, unlabeled, test

    if dataset == "Flowers102":
        labeled, unlabeled = [], []
        for split in ("train", "val"):
            with open(f"{data_folder}/{split}.txt", "r") as fh:
                for l in fh:
                    line = l.split(" ")
                    img = line[0].split("@")[-1].strip()
                    cl = classes[int(line[1].strip())]
                    if cl in seen_classes:
                        labeled.append((f"{split}/{img}", cl))
                    elif cl in unseen_classes:
                        unlabeled.append((f"{split}/{img}", cl))
                    else:
                        raise ValueError(f"class {cl} is neither seen nor unseen")
        test = []
        with open(f"{data_folder}/test.txt", "r") as fh:
            for l in fh:
                line = l.split(" ")
                img = line[0].split("@")[-1].strip()
                test.append((f"test/{img}", classes[int(line[1].strip())]))
        return labeled, unlabeled, test

    if dataset == "CUB":
        labeled, unlabeled = [], []
        with open(f"{data_folder}/train.txt", "r") as fh:
            for l in fh:
                line = l.strip()
                cl = line.split("/")[0].split(".")[-1].strip().replace("_", " ").lower()
                entry = (f"CUB_200_2011/images/{line}", cl)
                if cl in seen_classes:
                    labeled.append(entry)
                elif cl in unseen_classes:
                    unlabeled.append(entry)
                else:
                    raise ValueError(f"class {cl} is neither seen nor unseen")
        test = []
        with open(f"{data_folder}/test.txt", "r") as fh:
            for l in fh:
                line = l.strip()
                cl = line.split("/")[0].split(".")[-1].strip().replace("_", " ").lower()
                test.append((f"CUB_200_2011/images/{line}", cl))
        return labeled, unlabeled, test

    raise ValueError(f"Unknown dataset {dataset!r}")


def split_data(ratio: float, files: Sequence, labels: Sequence):
    """Seeded 80/20 split (reference prepare_data.py:607-620; fixed seed 500)."""
    np.random.seed(500)
    train_indices = np.random.choice(
        range(len(files)), size=int(len(files) * ratio), replace=False
    )
    val_indices = list(set(range(len(files))).difference(set(train_indices)))
    files = np.array(files)
    labels = np.array(labels)
    return files[train_indices], labels[train_indices], files[val_indices], labels[val_indices]


def train_val_split(files: Sequence, labels: Sequence, ratio: float, seed: int):
    """Seeded train/val split used by every driver (reference main_SSL.py:133-145)."""
    np.random.seed(seed)
    train_indices = np.random.choice(
        range(len(files)), size=int(len(files) * ratio), replace=False
    )
    val_indices = list(set(range(len(files))).difference(set(train_indices)))
    files = np.array(files)
    labels = np.array(labels)
    return (
        files[train_indices],
        labels[train_indices],
        files[val_indices],
        labels[val_indices],
    )


def sample_few_shots(labeled_files, labeles, classes, n_label: int, seed: int):
    """Few-shot sampling per class - bit-identical RNG placement to reference
    main_SSL.py:100-113 (np.random.seed is re-applied *inside* the class loop)."""
    labeled_files = np.array(labeled_files)
    labeles = np.array(labeles)
    few_files: list = []
    few_labs: list = []
    for c in classes:
        np.random.seed(seed)
        indices = np.random.choice(
            np.where(labeles == c)[0], size=n_label, replace=False
        )
        few_files += list(labeled_files[indices])
        few_labs += list(labeles[indices])
    return few_files, few_labs
