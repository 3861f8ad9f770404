"""FPL loss-POLICY A/B across the full 9-cell paradigm x modality grid.

Round-4's verdict found a real parity bug (the TRZSL-multimodal balance
dropped the reference's sqrt) that survived 280 tests because the existing
trainer A/Bs INJECTED our balance_param into the reference's published loss
(`ref.balance_param = strat.balance_param`), pinning the loss structure but
never its derivation.  This module closes that hole: for every cell of
{semi_supervised_learning, transductive_zsl, unsupervised_learning} x
{textual, visual, multimodal}, the reference's OWN published
`create_training_dataset` (reference methods/<paradigm>/<modality>_fpl.py)
derives balance_param / the merged training set / the pseudo-val carve, and
our production `_merge_pseudo` + `_set_loss_policy` must reproduce all of it
bit-for-bit — then the published `define_loss_function` is executed on the
merged batch and compared against our `two_group_loss` with the policy
weights our code derived.

Balance derivations being checked (all computed by the reference's code, not
asserted against constants):
  SSL   textual/visual: N_unseen/N_seen            (ssl/textual_fpl.py:115)
        multimodal:     sqrt(N_unseen/N_seen)      (ssl/multimodal_fpl.py:107)
  TRZSL textual/visual: N_seen/N_unseen            (trzsl/textual_fpl.py:109)
        multimodal:     sqrt(N_seen/N_unseen)      (trzsl/multimodal_fpl.py:104)
  UL    all:            no balance, plain CE       (ul/textual_fpl.py:112-128)

plus the UL epoch body run verbatim (ul/textual_prompt.py:62-151 through
ul/textual_fpl.py's plain-CE loss) against our fused UL trainer.

Skipped when /root/reference is not present.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.models import convert_state_dict
from menghini_neurips23_tpu.models.prompts import build_prompt_token_ids
from menghini_neurips23_tpu.runtime import ClipRuntime
from menghini_neurips23_tpu.training import (
    MultimodalStrategy,
    TextualStrategy,
    VisualStrategy,
)
from menghini_neurips23_tpu.training.losses import two_group_loss
from menghini_neurips23_tpu.training.schedulers import lr_for_epoch

# re-registers the module-scoped fixture here; helpers shared deliberately
from tests.test_reference_ab_trainer import (  # noqa: F401
    ACCUM,
    B,
    C,
    DECAY,
    EPOCHS,
    LR,
    N,
    WARMUP,
    _FeatDataset,
    _reference_prompt_cls,
    ab_setup,
)

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference repo not available"
)

PARADIGM_DIR = {
    "ssl": "semi_supervised_learning",
    "trzsl": "transductive_zsl",
    "ul": "unsupervised_learning",
}
OUR_STRATEGY = {
    "text": TextualStrategy,
    "image": VisualStrategy,
    "multi": MultimodalStrategy,
}
FPL_FNAME = {"text": "textual_fpl", "image": "visual_fpl", "multi": "multimodal_fpl"}


def _mk_ds(filepaths, labels):
    return types.SimpleNamespace(
        filepaths=list(filepaths), labels=list(labels), label_id=False
    )


def _ref_cfg(modality, n_pseudoshots):
    return types.SimpleNamespace(
        EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine", LR=LR,
        DECAY=DECAY, STEP_SIZE=1, PREFIX_SIZE=4, TEXT_PREFIX_SIZE=2,
        VISION_PREFIX_SIZE=2, TRANSFORMER_DIM=16, MEAN_INIT=0.0, VAR_INIT=0.02,
        PROMPT_TEMPLATE="a photo of a {}", DATASET_NAME="tinyset",
        VIS_ENCODER="tiny-test", SPLIT_SEED=500, N_PSEUDOSHOTS=n_pseudoshots,
        validation_seed=0, ratio_train_val=0.8,
    )


@pytest.mark.parametrize("modality", ["text", "image", "multi"])
@pytest.mark.parametrize("paradigm", ["ssl", "trzsl", "ul"])
@pytest.mark.parametrize("carve", [False, True], ids=["nocarve", "carve"])
def test_reference_fpl_policy_grid(
    ab_setup, tiny_runtime, monkeypatch, paradigm, modality, carve
):
    a, sd, *_ = ab_setup
    pdir = PARADIGM_DIR[paradigm]
    FPLCls, _ = _reference_prompt_cls(
        a, sd, monkeypatch, [], modality=modality, fpl=True, paradigm=pdir
    )
    fpl_mod = sys.modules[f"_ref_{pdir}_{FPL_FNAME[modality]}"]

    # 4 classes; TRZSL splits seen/unseen, SSL/UL treat all classes as both
    classes = [f"c{i}" for i in range(4)]
    l2i = {c: i for i, c in enumerate(classes)}
    if paradigm == "trzsl":
        seen, unseen = classes[:2], classes[2:]
    else:
        seen, unseen = classes, classes
    unseen_ids = [l2i[c] for c in unseen]

    # pseudo pool: labels are GLOBAL ids over the pseudo class space (the
    # reference's pseudolabel datasets set label_id=True); carve=True uses
    # N_PSEUDOSHOTS >= 10 so the published 80/20 pseudo-val split runs
    n_pseudoshots = 10 if carve else 4
    n_pseudo_raw = n_pseudoshots * len(unseen_ids)
    prng = np.random.default_rng(17)
    pseudo_paths = [f"unl{i}.png" for i in range(n_pseudo_raw)]
    pseudo_labels = [int(prng.choice(unseen_ids)) for _ in range(n_pseudo_raw)]
    n_seen = 6
    seen_paths = [f"lab{i}.png" for i in range(n_seen)]
    seen_names = [seen[i % len(seen)] for i in range(n_seen)]

    # ---- reference: its own published create_training_dataset derives the
    # balance, the merged set, and the pseudo-val carve
    cfgNS = _ref_cfg(modality, n_pseudoshots)
    ctor_args = (
        (cfgNS, l2i, ".", list(pseudo_paths), classes, seen, unseen, "cpu")
        if paradigm == "ssl"
        else (cfgNS, l2i, ".", classes, seen, unseen, "cpu")
    )
    ref = FPLCls(*ctor_args)
    ref.transform = None  # unpublished-base attr consumed as an arg only
    monkeypatch.setattr(
        fpl_mod, "pseudolabel_top_k",
        lambda *aa, **kk: _mk_ds(pseudo_paths, pseudo_labels),
    )
    # textual variants return the merged dataset; visual/multimodal mutate it
    # in place (reference visual_fpl.py create_training_dataset has no return)
    ref_train = _mk_ds(seen_paths, seen_names)
    ref.create_training_dataset(ref_train, unlabeled_data=object())

    # ---- ours: production _merge_pseudo + _set_loss_policy on the same data
    cfg = Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=B, MODALITY=modality,
        LEARNING_PARADIGM=paradigm, N_PSEUDOSHOTS=n_pseudoshots,
        validation_seed=0, ratio_train_val=0.8, TEXT_PREFIX_SIZE=2,
        VISION_PREFIX_SIZE=2, TRANSFORMER_DIM=16,
    )
    strat = OUR_STRATEGY[modality](
        cfg, l2i, classes, seen, unseen, runtime=tiny_runtime,
        unlabeled_files=list(pseudo_paths),
    )
    ours_train = strat._merge_pseudo(
        _mk_ds(seen_paths, seen_names), _mk_ds(pseudo_paths, pseudo_labels)
    )

    # balance derivation: the reference's own value, not our constant
    if paradigm == "ssl":
        assert strat.balance_param == ref.balance_param
        assert strat._w0 == ref.balance_param and strat._w1 == 1.0
    elif paradigm == "trzsl":
        assert strat.balance_param == ref.balance_param
        assert strat._w0 == 1.0 and strat._w1 == ref.balance_param
    else:  # UL: no balance anywhere in the published loss
        assert not hasattr(ref, "balance_param")
        assert strat._w0 == 1.0 and strat._w1 == 0.0
    if modality == "multi" and paradigm in ("ssl", "trzsl"):
        # the sqrt is load-bearing: the linear ratio must NOT equal it here
        n_unseen_final = sum(g == 1 for g in strat._train_groups)
        linear = (
            n_unseen_final / n_seen if paradigm == "ssl"
            else n_seen / n_unseen_final
        )
        assert ref.balance_param != linear
        assert ref.balance_param == pytest.approx(np.sqrt(linear))

    # merged composition + pseudo-val carve parity (RNG call-sequence match)
    assert list(ours_train.filepaths) == list(ref_train.filepaths)
    assert list(map(int, ours_train.labels)) == list(map(int, ref_train.labels))
    if carve:
        np.testing.assert_array_equal(strat.val_unseen_files, ref.val_unseen_files)
        np.testing.assert_array_equal(
            np.asarray(strat.val_unseen_labs, np.int64),
            np.asarray(ref.val_unseen_labs, np.int64),
        )
    else:
        assert strat.val_unseen_files is None and ref.val_unseen_files is None

    # ---- loss value A/B on the merged batch: published define_loss_function
    # vs our two_group_loss with the weights OUR policy derived
    n_total = len(ours_train.filepaths)
    logits = np.random.default_rng(23).normal(size=(n_total, 4)).astype(np.float32)
    labels = np.asarray(ours_train.labels, np.int64)
    logits_t = torch.from_numpy(logits)
    labs_t = torch.from_numpy(labels)
    if paradigm == "ssl":
        ref_loss = ref.define_loss_function(
            logits_t, labs_t, list(ref_train.filepaths)
        )
    else:
        ref_loss = ref.define_loss_function(logits_t, labs_t)
    ours_loss = two_group_loss(
        logits, labels.astype(np.int32),
        np.asarray(strat._train_groups, np.int32),
        np.ones(n_total, np.float32),
        np.float32(strat._w0), np.float32(strat._w1),
    )
    np.testing.assert_allclose(
        float(ours_loss), float(ref_loss), rtol=1e-5, atol=1e-6
    )


def test_reference_ul_trainer_matches_ours(ab_setup, monkeypatch):
    """UL epoch-body A/B: the published unsupervised_learning epoch
    (ul/textual_prompt.py:62-151 — all-classes prompts, plain label pass-
    through, no reindexing) with ul/textual_fpl.py's plain-CE loss, run
    verbatim for EPOCHS epochs against our fused UL trainer (group flags all
    0, w0=1, w1=0)."""
    a, sd, classes, l2i, labels, feats = ab_setup
    loss_log = []
    TextualFPL, sched_mod = _reference_prompt_cls(
        a, sd, monkeypatch, loss_log, modality="text", fpl=True,
        paradigm="unsupervised_learning",
    )

    cfgNS = _ref_cfg("text", 4)
    ref = TextualFPL(cfgNS, l2i, ".", classes, classes, classes, "cpu")

    cfg = Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=B, PREFIX_SIZE=4, LR=LR,
        DECAY=DECAY, EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine",
        ACCUMULATION_ITER=ACCUM, PROMPT_TEMPLATE="a photo of a {}",
        TEXT_TRUNCATE=False, LEARNING_PARADIGM="ul",
    )
    rt = ClipRuntime(cfg)
    _, params = convert_state_dict(sd)
    rt.params = params
    strat = TextualStrategy(cfg, l2i, classes, classes, classes, runtime=rt)
    strat._set_loss_policy(n_pseudo=N, n_labeled=0)
    assert strat._w0 == 1.0 and strat._w1 == 0.0
    prefix0 = np.asarray(strat.prefix).copy()

    orig_dlf = ref.define_loss_function

    def logged_dlf(logits, labs):
        out = orig_dlf(logits, labs)
        loss_log.append(float(out.detach()))
        return out

    ref.define_loss_function = logged_dlf
    ref.model = sys.modules["_ref_prompts_models"].TextPrefixModel(
        torch.from_numpy(prefix0).clone()[None], ref.text_encoder, classes,
        device="cpu",
    )
    ref.optimizer = torch.optim.SGD(
        [ref.model.prefix], lr=LR, weight_decay=DECAY, momentum=0.0
    )
    ref.scheduler = sched_mod.make_scheduler(ref.optimizer, cfgNS)
    loader = torch.utils.data.DataLoader(
        _FeatDataset(feats, labels), batch_size=B, shuffle=False
    )
    loss = total = 0.0
    for e in range(EPOCHS):
        assert ref.optimizer.param_groups[0]["lr"] == pytest.approx(
            lr_for_epoch(cfg, e), abs=1e-12
        )
        loss, total, _ = ref._train_epoch(
            loss, total, loader, accum_iter=ACCUM, epoch=e
        )
    prefix_ref = ref.model.prefix.detach().numpy()[0]

    # ours: UL policy = plain CE over every sample (all group 0)
    ids = build_prompt_token_ids(rt.tokenizer, classes, cfg.PREFIX_SIZE)
    step = strat._make_step(C)
    group = np.zeros(B, np.int32)
    valid = np.ones(B, np.float32)
    losses_ours = []
    for e in range(EPOCHS):
        lr = lr_for_epoch(cfg, e)
        n_batches = N // B
        for si in range(n_batches):
            sl = slice(si * B, (si + 1) * B)
            apply = ((si + 1) % ACCUM == 0) or (si + 1 == n_batches)
            l, _ = strat._apply_step(
                step, ids.astype(np.int32), lr, feats[sl],
                labels[sl].astype(np.int32), group, valid, apply=apply,
            )
            losses_ours.append(l)
    prefix_ours = np.asarray(strat.prefix)

    np.testing.assert_allclose(losses_ours, loss_log, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(prefix_ours, prefix_ref, rtol=1e-3, atol=1e-5)
    assert np.abs(prefix_ours - prefix0).max() > 1e-4
