"""Compiler-level sharding regression tests.

The multi-chip design contract (SURVEY.md §2.7, parallel/mesh.py): batches
are sharded on the 'data' axis, prompts/optimizer state are replicated, and
CLIP tower weights are tensor-sharded on the 'model' axis when the mesh has
one.  The XLA partitioner then inserts gradient all-reduces (and, under
tensor parallelism, activation collectives) — and must never need to gather
replicated weights.  These tests pin that at the compiled-HLO level: a
sharding annotation regression that silently turns into per-step weight
all-gathers would pass every numeric test while destroying ICI scaling.
"""

import numpy as np
import pytest

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.parallel import make_mesh, put_batch
from menghini_neurips23_tpu.runtime import ClipRuntime
from menghini_neurips23_tpu.training import TextualStrategy

CLASSES = ["a", "b", "c"]
L2I = {c: i for i, c in enumerate(CLASSES)}


def _compiled_step_text(runtime):
    """Lower the production CoOp train step with _apply_step's placements
    (replicated prompt/opt state, data-sharded batch) and return the compiled
    module text."""
    cfg = Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=8, PREFIX_SIZE=4, OPTIM_SEED=1,
        PROMPT_TEMPLATE="a photo of a {}", DATASET_NAME="MNIST",
        LEARNING_PARADIGM="ssl",
    )
    st = TextualStrategy(cfg, L2I, CLASSES, CLASSES, CLASSES, runtime=runtime)
    step = st._make_step(len(CLASSES))
    ctx = st._train_text_class_ids(CLASSES)
    B = 8
    feats = np.random.default_rng(0).normal(size=(B, runtime.arch.embed_dim))
    feats = feats.astype(np.float32)
    labels = np.zeros(B, np.int32)
    group = np.zeros(B, np.int32)
    valid = np.ones(B, np.float32)
    put = runtime.put_rep
    args = (
        runtime.params,
        put(st._get_prompt_tree()),
        put(st._mom),
        put(st._gacc),
        np.float32(0.01),
        put(np.asarray(ctx)),
        *put_batch(runtime.mesh, feats, labels, group, valid),
        np.float32(1.0),
        np.float32(0.0),
    )
    return step.lower(*args, apply=True).compile().as_text()


def test_dp_step_reduces_grads_and_never_gathers_weights(tiny_runtime):
    """Pure data parallelism (1D 8-device mesh): the step must contain
    gradient all-reduces and NO other collective — in particular no
    all-gather (replicated weights/prompts need no gathering) and no
    all-to-all/permute (there is no model axis to shuffle activations on)."""
    txt = _compiled_step_text(tiny_runtime)
    assert txt.count("all-reduce") > 0, "no gradient all-reduce in the DP step"
    for op in ("all-gather", "reduce-scatter", "all-to-all", "collective-permute"):
        assert txt.count(op) == 0, f"unexpected {op} in the pure-DP step"


def test_dp_tp_step_has_no_weight_allgather():
    """dp x tp (4,2) mesh: tensor parallelism legitimately adds activation
    collectives (all-to-all / collective-permute across 'model'), but a
    replicated-weight design must still compile to ZERO all-gathers — an
    all-gather here means the partitioner is materializing full tensors that
    the sharding specs promised stay distributed."""
    mesh = make_mesh((4, 2), ("data", "model"))
    rt = ClipRuntime(Config(VIS_ENCODER="tiny-test", BATCH_SIZE=8), mesh=mesh)
    txt = _compiled_step_text(rt)
    assert txt.count("all-reduce") > 0
    assert txt.count("all-gather") == 0, "weight/activation all-gather crept in"
