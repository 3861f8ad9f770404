"""The two bf16-era perf knobs are scoped AWAY from the multimodal path.

On v5e the fused UPT program (both prompted towers + mixer in one scan) sits
on a measured layout cliff: EITHER bf16-precast weights OR truncated text
context alone costs ~25% per 150-epoch run (91-110 s vs 73.6 s;
benchmarks/bisect_upt.py), while CoOp gains 2x from truncation and VPT is
neutral to precast.  These tests pin the scoping so a refactor can't silently
re-enable the knobs for MODALITY="multi".
"""

import jax.numpy as jnp
import numpy as np

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.runtime import ClipRuntime
from menghini_neurips23_tpu.training import MultimodalStrategy, TextualStrategy

CLASSES = ["0", "1", "2"]
L2I = {c: i for i, c in enumerate(CLASSES)}


def _cfg(**kw):
    return Config(
        VIS_ENCODER="tiny-test", OPTIM_SEED=1, PROMPT_TEMPLATE="a photo of a {}",
        DATASET_NAME="MNIST", LEARNING_PARADIGM="ssl", TEXT_PREFIX_SIZE=2,
        VISION_PREFIX_SIZE=2, TRANSFORMER_DIM=16, PREFIX_SIZE=4, **kw,
    )


def _matmul_leaf_dtypes(params):
    out = []

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, path + (k,))
        elif path[-1] == "in_proj_kernel":
            out.append(node.dtype)

    rec(params, ())
    return out


def test_multimodal_ids_are_never_truncated(tiny_runtime):
    cfg = _cfg(MODEL="multimodal_prompt", MODALITY="multi", TEXT_TRUNCATE=True)
    st = MultimodalStrategy(cfg, L2I, CLASSES, CLASSES, CLASSES, runtime=tiny_runtime)
    ids = st._train_text_class_ids(CLASSES)
    assert ids.shape[1] == tiny_runtime.arch.context_length

    # the textual modality DOES truncate under the same knob
    st_text = TextualStrategy(cfg, L2I, CLASSES, CLASSES, CLASSES, runtime=tiny_runtime)
    assert st_text._train_text_class_ids(CLASSES).shape[1] < ids.shape[1]


def test_modality_derived_from_model_name():
    """MODALITY derives from MODEL at Config construction (review fix): a
    runtime built from the launcher protocol alone - Config(MODEL=...) then
    ClipRuntime(cfg) BEFORE build_strategy assigns MODALITY - must still hit
    the multimodal precast gate."""
    assert Config(MODEL="multimodal_fpl").MODALITY == "multi"
    assert Config(MODEL="grip_visual").MODALITY == "image"
    assert Config(MODEL="textual_prompt").MODALITY == "text"
    assert Config(MODEL="clip_baseline").MODALITY == "text"
    assert Config(MODEL="grip_multimodal", MODALITY="multi").MODALITY == "multi"

    rt = ClipRuntime(_cfg(MODEL="grip_multimodal", COMPUTE_DTYPE="bfloat16"))
    assert all(d == np.float32 for d in _matmul_leaf_dtypes(rt.params))


def test_precast_skipped_for_multimodal_runtime():
    rt_multi = ClipRuntime(_cfg(MODALITY="multi", COMPUTE_DTYPE="bfloat16"))
    assert all(
        d == np.float32 for d in _matmul_leaf_dtypes(rt_multi.params)
    ), "multimodal runtime must keep fp32 master matmul weights"

    rt_text = ClipRuntime(_cfg(MODALITY="text", COMPUTE_DTYPE="bfloat16"))
    assert all(
        d == jnp.bfloat16 for d in _matmul_leaf_dtypes(rt_text.params)
    ), "non-multimodal bf16 runtime should precast matmul weights"
