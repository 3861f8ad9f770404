"""Dump the compiled (optimized, scheduled) HLO of the fused UPT program for
one layout-cliff variant (VERDICT r3 #5).

The v5e measurement (benchmarks/bisect_upt.py): the production fused UPT
program runs a 150-epoch tune in 73.6 s with bf16 weight precast and text
truncation BOTH off, but 91-110 s with EITHER on — a ~25% layout cliff that
is scoped off for MODALITY="multi" (runtime.py, multimodal.py).  This script
captures WHAT the compiler does differently: it assembles the exact
production fused-train arguments (through the strategy's own `train()`
plumbing), lowers + compiles the chunk program on the attached backend, and
writes the compiled module text for offline diffing.

Usage (one process per variant — tunnel compiles are per-process):
    python benchmarks/fingerprint_upt_cliff.py base     [outdir]
    python benchmarks/fingerprint_upt_cliff.py precast  [outdir]
    python benchmarks/fingerprint_upt_cliff.py truncate [outdir]

Analysis + the recorded v5e fingerprint live in
benchmarks/upt_cliff_fingerprint.json (written by --analyze over the three
dumps); tests/test_upt_cliff_fingerprint.py recomputes the structural
histogram from a dump and compares.
"""

import dataclasses
import json
import sys
from collections import Counter
from pathlib import Path

HISTOGRAM_OPS = (
    # structural signal: data-movement + precision ops whose counts move when
    # XLA re-layouts the program (fusion kinds cover the rest)
    "transpose(", "copy(", "convert(", "bitcast(", "reshape(",
    "kLoop", "kOutput", "kInput", "kCustom",
    "fusion(", "dot(", "convolution(", "custom-call(",
)


def structural_histogram(hlo_text: str) -> dict:
    """Order-independent instruction histogram of a compiled module dump.

    Counts opcode call sites (`name = type opcode(...)`) for the
    data-movement ops and fusion kinds above, plus the multiset of dot shapes.
    Deliberately ignores instruction NAMES and schedules (they churn with
    every toolchain bump) — the cliff signature is how much explicit data
    movement the layout assignment inserted around the big dots.
    """
    hist = Counter()
    dot_shapes = Counter()
    cc_targets = Counter()
    for line in hlo_text.splitlines():
        s = line.strip()
        if " = " not in s:
            continue
        rhs = s.split(" = ", 1)[1]
        for op in HISTOGRAM_OPS:
            if op.endswith("(") and f" {op}" in f" {rhs}":
                hist[op.rstrip("(")] += 1
            elif not op.endswith("(") and op in rhs:
                hist[op] += 1
        # TPU HLO spells matmuls `convolution(`; CPU/GPU spell them `dot(`.
        # Key the multiset by the RESULT type+shape+layout so a layout
        # re-assignment on any matmul is visible even at equal op counts.
        if " dot(" in f" {rhs}" or " convolution(" in f" {rhs}":
            dot_shapes[rhs.split(" ", 1)[0]] += 1
        if 'custom_call_target="' in rhs:
            cc_targets[rhs.split('custom_call_target="', 1)[1].split('"')[0]] += 1
    return {
        "ops": dict(sorted(hist.items())),
        "dot_shapes": dict(sorted(dot_shapes.items())),
        "custom_call_targets": dict(sorted(cc_targets.items())),
    }


def dump_variant(variant: str, outdir: Path) -> Path:
    import os

    import numpy as np

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/menghini_bench_jax_cache"),
    )
    from menghini_neurips23_tpu.config import Config
    from menghini_neurips23_tpu.runtime import ClipRuntime
    from menghini_neurips23_tpu.training import MultimodalStrategy

    tiny = bool(os.environ.get("FINGERPRINT_TINY"))  # CPU wiring check only
    # the production bench shape (bisect_upt.py), one 50-epoch chunk: the
    # chunked call compiles exactly this program for the 150-epoch run
    cfg = Config(
        VIS_ENCODER="tiny-test" if tiny else "ViT-B/32",
        BATCH_SIZE=8 if tiny else 256, EPOCHS=2 if tiny else 50, LR=0.01,
        TEXT_PREFIX_SIZE=4, VISION_PREFIX_SIZE=4, TRANSFORMER_DIM=128,
        OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
        MODEL="multimodal_prompt", MODALITY="multi", DATASET_NAME="EuroSAT",
        LEARNING_PARADIGM="ssl", COMPUTE_DTYPE="bfloat16",
        FUSED_EPOCH_CHUNK=50,
    )
    if variant == "precast":
        # force the scoped-off precast onto the multi runtime: build the
        # runtime under a text-modality view of the same config (the gate is
        # runtime.py's MODALITY != "multi"), then train under MODALITY=multi
        rt = ClipRuntime(dataclasses.replace(cfg, MODALITY="text"))
    else:
        rt = ClipRuntime(cfg)

    classes = [f"class {i}" for i in range(10)]
    l2i = {c: i for i, c in enumerate(classes)}
    strat = MultimodalStrategy(cfg, l2i, classes, classes, classes, runtime=rt)

    if variant == "truncate":
        # force the scoped-off text truncation (multimodal.py deliberately
        # skips it): T 77 -> the batch's last EOT, exact under causal masking
        from menghini_neurips23_tpu.models.prompts import (
            build_prompt_token_ids,
            truncate_context,
        )

        strat._train_text_class_ids = lambda cl: truncate_context(
            build_prompt_token_ids(rt.tokenizer, cl, cfg.TEXT_PREFIX_SIZE)
        )

    n, val_n = 2048, 256
    rng = np.random.default_rng(0)
    S, W = rt.arch.num_patches + 1, rt.arch.vision_width
    tok_train = rng.normal(0, 1, (n, S, W)).astype(np.float32)
    tok_val = rng.normal(0, 1, (val_n, S, W)).astype(np.float32)
    strat._features_for_paths = lambda paths, cache=True: np.stack(
        [tok_train[int(p[1:])] if p[0] == "t" else tok_val[int(p[1:])]
         for p in paths]
    )

    class DS:
        def __init__(self, count, pre):
            self.filepaths = [f"{pre}{i}" for i in range(count)]
            self.labels = [i % 10 for i in range(count)]
            self.label_id = True
            self.label_map = l2i

        def label_ids(self):
            return [int(lb) for lb in self.labels]

    class _Captured(Exception):
        pass

    out_path = outdir / f"upt_hlo_{variant}.txt"
    orig_build = strat._build_fused_train

    def capture_build(*a, **k):
        fused = orig_build(*a, **k)

        def wrapper(*args):
            txt = fused.lower(*args).compile().as_text()
            out_path.write_text(txt)
            raise _Captured

        return wrapper

    strat._build_fused_train = capture_build
    try:
        strat.train(DS(n, "t"), DS(val_n, "v"), only_seen=True)
    except _Captured:
        pass
    else:
        raise RuntimeError("fused path was not taken — nothing captured")
    (outdir / "backend.txt").write_text(jax.default_backend())
    return out_path


def analyze(outdir: Path):
    """Summarize the three dumps into upt_cliff_fingerprint.json (jax-free:
    the backend comes from the sidecar the dump step wrote)."""
    backend = (outdir / "backend.txt").read_text().strip() \
        if (outdir / "backend.txt").exists() else "unknown"
    entry = {"backend": backend, "variants": {}}
    for variant in ("base", "precast", "truncate"):
        p = outdir / f"upt_hlo_{variant}.txt"
        if not p.exists():
            print(f"missing {p} — run the {variant} variant first")
            continue
        entry["variants"][variant] = structural_histogram(p.read_text())
    out = Path(__file__).parent / "upt_cliff_fingerprint.json"
    out.write_text(json.dumps(entry, indent=2) + "\n")
    print(f"wrote {out}")
    for v, h in entry["variants"].items():
        print(v, json.dumps(h["ops"]))


def main():
    outdir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/tmp/upt_cliff")
    outdir.mkdir(parents=True, exist_ok=True)
    if sys.argv[1] == "--analyze":
        analyze(outdir)
        return
    p = dump_variant(sys.argv[1], outdir)
    print(f"wrote {p} ({p.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
