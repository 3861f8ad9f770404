"""Context truncation (TEXT_TRUNCATE) must be EXACT: CLIP's text attention
is causal, so dropping all-padding positions after the batch's last EOT
cannot change any kept position's value (the reference always runs all 77
positions; this is pure saved compute on our side)."""

import numpy as np
import pytest

from menghini_neurips23_tpu.models.prompts import (
    build_prompt_token_ids,
    coop_text_features,
    init_prefix,
    truncate_context,
)


def test_truncate_context_semantics():
    ids = np.zeros((3, 77), dtype=np.int32)
    # simulate sot + tokens + eot (eot = largest id)
    ids[0, :5] = [500, 3, 4, 5, 513]
    ids[1, :9] = [500, 3, 4, 5, 6, 7, 8, 9, 513]
    ids[2, :3] = [500, 3, 513]
    out = truncate_context(ids)
    assert out.shape == (3, 16)  # last EOT at index 8 -> 9 -> round up to 16
    np.testing.assert_array_equal(out, ids[:, :16])
    # EOT still the argmax of every row
    np.testing.assert_array_equal(out.argmax(-1), ids.argmax(-1))
    # already-full context: no-op
    full = np.zeros((1, 8), dtype=np.int32)
    full[0, :8] = [500, 1, 2, 3, 4, 5, 6, 513]
    assert truncate_context(full).shape == (1, 8)


def test_truncated_coop_features_are_exact(tiny_runtime):
    """coop_text_features over truncated ids == over full-77 ids."""
    import jax

    rt = tiny_runtime
    classes = ["0", "1", "2"]
    ids_full = build_prompt_token_ids(rt.tokenizer, classes, 4)
    ids_trunc = truncate_context(ids_full)
    assert ids_trunc.shape[1] < ids_full.shape[1]
    prefix = init_prefix(jax.random.PRNGKey(0), 4, rt.arch.transformer_width)
    f_full = np.asarray(
        coop_text_features(rt.model, rt.params, prefix, np.asarray(ids_full))
    )
    f_trunc = np.asarray(
        coop_text_features(rt.model, rt.params, prefix, np.asarray(ids_trunc))
    )
    np.testing.assert_allclose(f_trunc, f_full, rtol=1e-6, atol=1e-6)


def test_truncated_zero_shot_features_are_exact(tiny_runtime):
    rt = tiny_runtime
    ids_full = rt.tokenizer.tokenize([f"a photo of a {c}" for c in "012"])
    f_full = rt.encode_text(ids_full, normalize=True)
    f_trunc = rt.encode_text(truncate_context(ids_full), normalize=True)
    np.testing.assert_allclose(f_trunc, f_full, rtol=1e-6, atol=1e-6)


def test_training_invariant_to_truncation(tmp_path, mnist_fixture, tiny_runtime):
    """A full textual training run is unchanged by TEXT_TRUNCATE (same RNG
    stream, same batches; only dead context compute is removed)."""
    from menghini_neurips23_tpu.training import TextualStrategy
    from tests.test_training import _build_config, _datasets, _strategy

    root, _ = mnist_fixture
    results = {}
    for trunc in (True, False):
        cfg = _build_config(
            tmp_path / f"tr{trunc}", MODEL="textual_fpl", EPOCHS=2,
            N_PSEUDOSHOTS=2, TEXT_TRUNCATE=trunc,
        )
        classes, l2i, train, val, unlabeled, test = _datasets(mnist_fixture)
        strat = _strategy(TextualStrategy, cfg, classes, l2i, tiny_runtime, root, unlabeled)
        train2 = strat.create_training_dataset(train, unlabeled)
        acc, params = strat.train(train2, val, only_seen=False)
        results[trunc] = (acc, params[0])
    acc_t, p_t = results[True]
    acc_f, p_f = results[False]
    assert acc_t == pytest.approx(acc_f, abs=1e-6)
    np.testing.assert_allclose(p_t, p_f, rtol=1e-5, atol=1e-7)
