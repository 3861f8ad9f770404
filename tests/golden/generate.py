"""Golden parity fixture generator.

Freezes the RNG-parity surfaces CLAUDE.md promises bit-identical to the
reference (reference utils/prepare_data.py:92-99, main_SSL.py:100-116,
utils/clip_pseudolabels.py:47-109) plus the artifact filename schemas
(reference utils/compute_metrics.py:105-171, clip_pseudolabels.py:134) as a
checked-in JSON.  tests/test_golden.py regenerates everything and diffs
against golden.json - cheap insurance that refactors can't silently move
these invariants.

Regenerate (only when an invariant is INTENTIONALLY changed - which, for the
RNG surfaces, means breaking reference parity; don't):

    python tests/golden/generate.py --write
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

GOLDEN_PATH = Path(__file__).with_name("golden.json")


def build_golden() -> dict:
    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.data.prepare import (
        _seeded_62pct_split,
        sample_few_shots,
        split_data,
        train_val_split,
    )
    from menghini_neurips23_tpu.evaluation.persist import _prompt_file_name
    from menghini_neurips23_tpu.pseudo.engine import (
        leaderboard_top_k,
        pseudolabel_cache_path,
    )

    out: dict = {}

    # 1. seeded 62% seen/unseen class splits, the reference's three seeds
    classes = [f"class{i:02d}" for i in range(20)]
    out["seeded_62pct_split"] = {
        str(seed): dict(zip(("seen", "unseen"), _seeded_62pct_split(classes, seed)))
        for seed in (500, 0, 200)
    }

    # 2. few-shot sampling (seed re-applied INSIDE the class loop - the
    # reference quirk, main_SSL.py:100-113)
    files = [f"f{i:03d}.png" for i in range(40)]
    labs = [f"class{i % 5:02d}" for i in range(40)]
    shots_files, shots_labs = sample_few_shots(
        files, labs, [f"class{i:02d}" for i in range(5)], 2, 0
    )
    out["sample_few_shots"] = {"files": list(shots_files), "labels": list(shots_labs)}

    # 3. train/val split (seed 0) and the fixed-seed-500 split_data fallback
    tf, tl, vf, vl = train_val_split(files, labs, 0.8, 0)
    out["train_val_split"] = {
        "train_files": list(tf), "train_labels": list(tl),
        "val_files": list(vf), "val_labels": list(vl),
    }
    tf, tl, vf, vl = split_data(0.8, files, labs)
    out["split_data"] = {
        "train_files": list(tf), "train_labels": list(tl),
        "val_files": list(vf), "val_labels": list(vl),
    }

    # 4. leaderboard cascade: a probs matrix dense enough to overflow boards
    # and fire the cascade-to-next-best-class path.  Values are rounded to 6
    # decimals BEFORE selection so the fixture is exactly serializable.
    rng = np.random.default_rng(123)
    probs = rng.dirichlet(np.ones(5) * 0.5, size=40).astype(np.float32)
    probs = np.round(probs, 6).astype(np.float32)
    paths = [f"pool/img{i:03d}.png" for i in range(40)]
    sel_files, sel_labels = leaderboard_top_k(probs, paths, 3, [10, 11, 12, 13, 14])
    out["leaderboard"] = {
        "probs": [[float(x) for x in row] for row in probs],
        "k": 3,
        "class_ids": [10, 11, 12, 13, 14],
        "filepaths": sel_files,
        "labels": sel_labels,
    }
    # the label-everything sentinel (reference clip_pseudolabels.py:27-44)
    all_files, all_labels = leaderboard_top_k(probs, paths, 10000000, [10, 11, 12, 13, 14])
    out["leaderboard_label_all"] = {"filepaths": all_files, "labels": all_labels}

    # 5. artifact filename schemas (byte-matched to the reference)
    cfg = Config(
        DATASET_NAME="Flowers102", LEARNING_PARADIGM="ssl", MODEL="grip_textual",
        VIS_ENCODER="ViT-B/32", OPTIM_SEED=1, SPLIT_SEED=500, ARTIFACT_DIR=".",
    )
    out["filenames"] = {
        "prompt": _prompt_file_name(cfg),
        "prompt_iter3": _prompt_file_name(cfg, iteration=3),
        "pseudolabel_cache": pseudolabel_cache_path(
            ".", "Flowers102", "ViT-B/32", "ssl", "grip_textual", 16, 500
        ),
    }
    return out


if __name__ == "__main__":
    import sys

    golden = build_golden()
    if "--write" in sys.argv:
        GOLDEN_PATH.write_text(json.dumps(golden, indent=1, sort_keys=True) + "\n")
        print(f"wrote {GOLDEN_PATH}")
    else:
        print(json.dumps(golden, indent=1, sort_keys=True))
