"""Wall-clock phase breakdown of bench_grip_e2e (one chip).

Monkey-patches timers around the GRIP loop's phase methods (no product
change) and then runs bench_grip_e2e.py verbatim, attributing the end-to-end
time to: fused device execution (`_fused_chunked_call`), host-side epoch/val
prep, pseudolabel refresh (`get_pseudo_labels` — leaderboard + tuned probs),
bootstrap + merge, and artifact IO (the residual).  Drives the choice of the
next optimization target (see benchmarks/README.md).
"""
import collections
import pathlib
import runpy
import time

from menghini_neurips23_tpu.training.strategy import TrainingStrategy

TIMES = collections.Counter()
COUNTS = collections.Counter()
_DEPTH = {"n": 0}  # train() nests the others; only bill exclusive time to train


def _timed(name):
    orig = getattr(TrainingStrategy, name)

    def wrap(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **k)
        finally:
            TIMES[name] += time.perf_counter() - t0
            COUNTS[name] += 1

    wrap.__name__ = name
    setattr(TrainingStrategy, name, wrap)


PHASES = [
    "train",                  # full per-iteration training incl. everything below
    "_prepare_epoch_data",    # host: features lookup + label remap
    "_prepare_val_data",
    "_fused_train_inputs",    # host: padding/bucketing + device puts
    "_fused_chunked_call",    # device: the fused whole-run scan (exec only)
    "get_pseudo_labels",      # refresh: prompted pool pass + leaderboard
    "create_training_dataset",  # iteration-1 bootstrap (zero-shot + leaderboard)
    "_merge_pseudo",
]
for m in PHASES:
    _timed(m)

t0 = time.perf_counter()
runpy.run_path(
    str(pathlib.Path(__file__).with_name("bench_grip_e2e.py")), run_name="__main__"
)
total = time.perf_counter() - t0
print(f"PHASES total_incl_setup={total:.1f}s")
for name in PHASES:
    print(f"PHASE {name}: {TIMES[name]:7.1f}s  x{COUNTS[name]}")
inner = sum(TIMES[m] for m in PHASES if m != "train")
print(f"PHASE train-exclusive (best-val/save/load residual): "
      f"{TIMES['train'] - sum(TIMES[m] for m in ('_prepare_epoch_data', '_prepare_val_data', '_fused_train_inputs', '_fused_chunked_call')):.1f}s")
