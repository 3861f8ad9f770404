"""TRUE A/B at the TRAINER level: execute the reference's PUBLISHED training
code (imported read-only from /root/reference) against our fused trainer on
identical weights, data, and schedule.

test_reference_ab.py already executes the reference's importable pure
functions (splits, leaderboard, metrics).  This module goes one layer up and
runs the reference's published nn.Modules and epoch body verbatim:

- models/prompts_models.py: TextPrefixModel (reference models/prompts_models.py:10-36)
- models/clip_encoders.py: CustomTextEncoder incl. the [:, 1:L+1, :] splice
  and argmax-EOT gather (reference models/clip_encoders.py:25-90)
- methods/semi_supervised_learning/textual_prompt.py: __init__ and the whole
  _train_epoch body - loss cadence, loss/accum -> accelerator.backward,
  optimizer step every accum_iter, scheduler stepped once per epoch
  (reference textual_prompt.py:63-160)
- utils/schedulers.py: the actual make_scheduler / WarmupCosineSchedule

The reference repo does NOT publish its TrainingStrategy base class
(SURVEY.md §2.9: `from .training_strategies import TrainingStrategy` has no
source file), so the base is stubbed here with exactly the SPEC.md-frozen
decisions (SGD on the prompt only, wd torch-style, CE loss, per-epoch
scheduler).  That is the point of the A/B: given those frozen decisions, the
reference's published layers must produce the same optimization trajectory
as our lax.scan trainer.

The `clip` pip package is stubbed (zero egress): tokenize routes through our
BPE-compatible tokenizer, and the text tower is the torch-functional oracle
already pinned against our flax model, wrapped as the module objects
CustomTextEncoder expects.  Images are pre-encoded features with
encode_image = identity, mirroring both pipelines' frozen-feature caching.

Skipped when /root/reference is not present.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

from menghini_neurips23_tpu.models import TINY_TEST, convert_state_dict
from menghini_neurips23_tpu.models.prompts import build_prompt_token_ids
from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.runtime import ClipRuntime
from menghini_neurips23_tpu.tokenizer import get_tokenizer
from menghini_neurips23_tpu.training import TextualStrategy
from menghini_neurips23_tpu.training.schedulers import lr_for_epoch

from tests.test_torch_parity import _make_state_dict, _torch_block

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference repo not available"
)

LR, DECAY = 0.1, 0.1
EPOCHS, WARMUP, ACCUM = 5, 2, 2
B, N, C = 8, 16, 3


def _load_module(name, path, monkeypatch):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    monkeypatch.setitem(sys.modules, name, mod)
    spec.loader.exec_module(mod)
    return mod


class _OracleTransformer(torch.nn.Module):
    """A transformer tower in the (T, B, W) convention the real
    clip.model.Transformer uses, built from the oracle block functions that
    are already pinned against our flax towers."""

    def __init__(self, sd, key_prefix, layers, heads, causal):
        super().__init__()
        self.sd = sd
        self.key_prefix, self.layers, self.heads = key_prefix, layers, heads
        self.causal = causal

    def forward(self, x):
        mask = None
        if self.causal:
            T = x.shape[0]
            mask = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
        for i in range(self.layers):
            x = _torch_block(
                x, self.sd, f"{self.key_prefix}.resblocks.{i}", self.heads, mask
            )
        return x


class _FakeClipModel:
    """The attribute surface CustomTextEncoder/_train_epoch consume from the
    real `clip.load` model.  encode_image is identity: the dataloader yields
    pre-encoded features, exactly like both frameworks' feature caches."""

    def __init__(self, sd, arch):
        t = lambda k: torch.from_numpy(sd[k])
        self._sd, self._arch = sd, arch
        self.transformer = _OracleTransformer(
            sd, "transformer", arch.transformer_layers,
            arch.transformer_heads, causal=True,
        )
        self.positional_embedding = t("positional_embedding")
        self.text_projection = t("text_projection")
        self.logit_scale = t("logit_scale")
        emb = torch.nn.Embedding(*sd["token_embedding.weight"].shape)
        with torch.no_grad():
            emb.weight.copy_(t("token_embedding.weight"))
        emb.weight.requires_grad_(False)
        self.token_embedding = emb
        W = arch.transformer_width
        ln = torch.nn.LayerNorm(W, eps=1e-5)
        with torch.no_grad():
            ln.weight.copy_(t("ln_final.weight"))
            ln.bias.copy_(t("ln_final.bias"))
        for p in ln.parameters():
            p.requires_grad_(False)
        self.ln_final = ln

    def encode_image(self, img):
        return img

    def encode_text(self, ids):
        from tests.test_torch_parity import _torch_encode_text

        return _torch_encode_text(self._sd, self._arch, ids)


class _FakeVisionTransformer(torch.nn.Module):
    """The attribute surface CustomVisionTransformer copies from the real
    clip model's .visual (reference clip_encoders.py:108-121)."""

    def __init__(self, sd, arch):
        super().__init__()
        t = lambda k: torch.from_numpy(sd[k])
        W, P = arch.vision_width, arch.vision_patch_size
        conv = torch.nn.Conv2d(3, W, P, stride=P, bias=False)
        with torch.no_grad():
            conv.weight.copy_(t("visual.conv1.weight"))
        conv.weight.requires_grad_(False)
        self.conv1 = conv
        self.class_embedding = t("visual.class_embedding")
        self.positional_embedding = t("visual.positional_embedding")

        def ln(prefix):
            m = torch.nn.LayerNorm(W, eps=1e-5)
            with torch.no_grad():
                m.weight.copy_(t(f"{prefix}.weight"))
                m.bias.copy_(t(f"{prefix}.bias"))
            for p in m.parameters():
                p.requires_grad_(False)
            return m

        self.ln_pre = ln("visual.ln_pre")
        self.ln_post = ln("visual.ln_post")
        self.transformer = _OracleTransformer(
            sd, "visual.transformer", arch.vision_layers, arch.vision_heads,
            causal=False,
        )
        self.proj = t("visual.proj")
        self.input_resolution = arch.image_resolution
        self.output_dim = arch.embed_dim


class _FeatDataset(torch.utils.data.Dataset):
    """Yields the 5-tuple the reference CustomDataset yields
    (reference data/dataset.py __getitem__): (img, aug1, aug2, label, path)."""

    def __init__(self, feats, labels, paths=None):
        self.feats, self.labels = feats, labels
        self.paths = paths or [f"img{i}.png" for i in range(len(labels))]

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i):
        f = torch.from_numpy(self.feats[i])
        return f, 0, 0, int(self.labels[i]), self.paths[i]


@pytest.fixture(scope="module")
def ab_setup():
    a = TINY_TEST
    rng = np.random.default_rng(11)
    sd = _make_state_dict(a, rng)
    classes = [f"c{i}" for i in range(C)]
    l2i = {c: i for i, c in enumerate(classes)}
    labels = rng.integers(0, C, N).astype(np.int64)
    feats = np.random.default_rng(2).normal(size=(N, a.embed_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    return a, sd, classes, l2i, labels, feats


def _reference_prompt_cls(a, sd, monkeypatch, loss_log, modality="text",
                          fpl=False, paradigm="semi_supervised_learning"):
    """Import the reference's textual/visual/multimodal prompt module (from
    the given paradigm dir) with its unpublished dependencies stubbed, and
    return the strategy class.  fpl=True (text only) additionally loads
    textual_fpl.py on top and returns TextualFPL - the published two-group
    pseudolabel loss policy."""
    tok = get_tokenizer()

    clip_stub = types.ModuleType("clip")

    def tokenize(texts):
        if isinstance(texts, str):
            texts = [texts]
        return torch.from_numpy(
            tok.tokenize(list(texts), context_length=a.context_length)
        ).long()

    clip_stub.tokenize = tokenize
    clip_stub.clip = clip_stub  # `from clip import clip`
    # UPTModel instantiates clip.model.Transformer as its TRAINABLE mixer
    # (reference prompts_models.py:116-119) - _StubTransformer is defined
    # below at module level
    clip_stub.model = types.SimpleNamespace(
        Transformer=globals().get("_StubTransformer")
    )
    monkeypatch.setitem(sys.modules, "clip", clip_stub)

    enc = _load_module("_ref_clip_encoders", REF / "models/clip_encoders.py",
                       monkeypatch)
    pm = _load_module("_ref_prompts_models", REF / "models/prompts_models.py",
                      monkeypatch)
    models_stub = types.ModuleType("models")
    models_stub.CustomTextEncoder = enc.CustomTextEncoder
    models_stub.TextPrefixModel = pm.TextPrefixModel
    models_stub.CustomImageEncoder = enc.CustomImageEncoder
    models_stub.ImagePrefixModel = pm.ImagePrefixModel
    monkeypatch.setitem(sys.modules, "models", models_stub)

    # torch-version shim: the reference passes verbose=True to LambdaLR
    # (reference utils/schedulers.py:50), a kwarg removed in torch >= 2.4.
    # verbose only printed the lr - dropping it is semantics-free.
    orig_init = torch.optim.lr_scheduler.LambdaLR.__init__

    def _lambda_init(self, optimizer, lr_lambda, last_epoch=-1, **kw):
        kw.pop("verbose", None)
        orig_init(self, optimizer, lr_lambda, last_epoch=last_epoch, **kw)

    monkeypatch.setattr(torch.optim.lr_scheduler.LambdaLR, "__init__", _lambda_init)

    sched_mod = _load_module("_ref_schedulers", REF / "utils/schedulers.py",
                             monkeypatch)
    utils_stub = types.ModuleType("utils")
    utils_stub.make_scheduler = sched_mod.make_scheduler
    utils_stub.seed_worker = lambda *aa, **kk: None
    # only referenced by textual_fpl's dataset/pseudolabel methods, which the
    # A/B does not drive
    utils_stub.dataset_object = lambda *aa, **kk: None
    utils_stub.pseudolabel_top_k = lambda *aa, **kk: None
    monkeypatch.setitem(sys.modules, "utils", utils_stub)

    class StubBase:
        """SPEC.md-frozen reconstruction of the UNPUBLISHED base class —
        only what the published __init__/_train_epoch consume."""

        def __init__(self, config, label_to_idx, classes, seen, unseen, device):
            self.config = config
            self.label_to_idx = label_to_idx
            self.classes = classes
            self.seen_classes = seen
            self.unseen_classes = unseen
            self.device = device
            self.dtype = torch.float32
            self.clip_model = _FakeClipModel(sd, a)
            self.template = getattr(config, "PROMPT_TEMPLATE", "a photo of a {}")
            self.loss_func = torch.nn.CrossEntropyLoss()  # FPL cross_entropy

        def declare_custom_encoder(self):
            if modality in ("text", "multi"):
                self.text_encoder = enc.CustomTextEncoder(
                    self.clip_model, self.device, self.dtype
                )
            if modality in ("image", "multi"):
                self.image_encoder = enc.CustomImageEncoder(
                    _FakeVisionTransformer(sd, a)
                )

        def initialize_prompts_parameters(self):
            # placeholder; the A/B seeds the prefix from our strategy so
            # both trainers start from the identical tensor
            self.initial_prefix = torch.zeros(
                self.config.PREFIX_SIZE, a.transformer_width
            )

        def define_loss_function(self, logits, labs, paths):  # SPEC #1/#9
            loss = torch.nn.functional.cross_entropy(logits, labs)
            loss_log.append(float(loss.detach()))
            return loss

        def backpropagate(self):  # SPEC #1
            self.optimizer.step()
            self.optimizer.zero_grad()

        def update_scheduler(self):  # SPEC #2 (per-epoch)
            self.scheduler.step()

        def unwrap_model(self):
            return self.model

    mss_stub = types.ModuleType(f"methods.{paradigm}")
    mss_stub.TrainingStrategy = StubBase
    methods_stub = types.ModuleType("methods")
    setattr(methods_stub, paradigm, mss_stub)
    monkeypatch.setitem(sys.modules, "methods", methods_stub)
    monkeypatch.setitem(sys.modules, f"methods.{paradigm}", mss_stub)

    fname, cls_name = {
        "text": ("textual_prompt", "TextualPrompt"),
        "image": ("visual_prompt", "VisualPrompt"),
        "multi": ("multimodal_prompt", "MultimodalPrompt"),
    }[modality]
    mod = _load_module(
        f"_ref_{paradigm}_{fname}",
        REF / f"methods/{paradigm}/{fname}.py",
        monkeypatch,
    )
    cls = getattr(mod, cls_name)
    if fpl:
        setattr(mss_stub, cls_name, cls)  # {m}_fpl imports it from the pkg
        fpl_fname = fname.replace("_prompt", "_fpl")
        fpl_mod = _load_module(
            f"_ref_{paradigm}_{fpl_fname}",
            REF / f"methods/{paradigm}/{fpl_fname}.py",
            monkeypatch,
        )
        cls = getattr(
            fpl_mod,
            {"text": "TextualFPL", "image": "VisualFPL",
             "multi": "MultimodalFPL"}[modality],
        )
    return cls, sched_mod


def test_reference_trainer_matches_ours(ab_setup, monkeypatch):
    a, sd, classes, l2i, labels, feats = ab_setup
    loss_log = []
    TextualPrompt, sched_mod = _reference_prompt_cls(a, sd, monkeypatch, loss_log)

    cfgNS = types.SimpleNamespace(
        EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine", LR=LR,
        DECAY=DECAY, STEP_SIZE=1, PREFIX_SIZE=4, MEAN_INIT=0.0, VAR_INIT=0.02,
    )
    ref = TextualPrompt(cfgNS, l2i, classes, classes, classes, "cpu")

    # ---- our trainer, same weights / prefix / schedule / batch layout
    cfg = Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=B, PREFIX_SIZE=4, LR=LR,
        DECAY=DECAY, EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine",
        ACCUMULATION_ITER=ACCUM, PROMPT_TEMPLATE="a photo of a {}",
        TEXT_TRUNCATE=False,
    )
    rt = ClipRuntime(cfg)
    arch, params = convert_state_dict(sd)
    rt.params = params
    strat = TextualStrategy(cfg, l2i, classes, classes, classes, runtime=rt)
    prefix0 = np.asarray(strat.prefix).copy()

    # cross-check: our prompt token frame == the reference's "X X .. X c"
    ids_ours = build_prompt_token_ids(rt.tokenizer, classes, cfg.PREFIX_SIZE)
    prompts = [" ".join(["X"] * cfg.PREFIX_SIZE).strip() + " " + c for c in classes]
    ids_ref = rt.tokenizer.tokenize(prompts, context_length=a.context_length)
    np.testing.assert_array_equal(ids_ours, ids_ref)

    # ---- drive the PUBLISHED epoch body for EPOCHS epochs
    # CustomTextEncoder.forward only executes for a BATCHED prefix: it reads
    # L from class_embeddings.size()[1] and splices [:, 1:L+1, :]
    # (reference clip_encoders.py:55-67) - i.e. the unpublished base must
    # hand TextPrefixModel a (1, L, W) shared context (our (L, W) broadcast
    # is the same math).
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
    # reference per-epoch lr must equal our lr_for_epoch exactly
    loss = total = 0.0
    for e in range(EPOCHS):
        assert ref.optimizer.param_groups[0]["lr"] == pytest.approx(
            lr_for_epoch(cfg, e), abs=1e-12
        )
        loss, total, _ = ref._train_epoch(
            loss, total, loader, accum_iter=ACCUM, epoch=e, only_seen=True
        )
    prefix_ref = ref.model.prefix.detach().numpy()[0]

    # ---- ours: same slices in the same order (loader shuffle=False)
    step = strat._make_step(C)
    ctx = ids_ours.astype(np.int32)
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
                step, ctx, lr, feats[sl], labels[sl].astype(np.int32),
                group, valid, apply=apply,
            )
            losses_ours.append(l)
    prefix_ours = np.asarray(strat.prefix)

    np.testing.assert_allclose(losses_ours, loss_log, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(prefix_ours, prefix_ref, rtol=1e-3, atol=1e-5)
    # the trajectory moved (this isn't a frozen no-op comparison)
    assert np.abs(prefix_ours - prefix0).max() > 1e-4


def test_reference_visual_trainer_matches_ours(ab_setup, monkeypatch):
    """Same A/B for VPT: the reference's published CustomVisionTransformer
    (CLS-then-prefix splice, reference clip_encoders.py:123-193),
    ImagePrefixModel, and visual_prompt._train_epoch (frozen templated text
    features re-encoded per epoch, reference visual_prompt.py:88-150) against
    our fused VPT step on identical images/weights/schedule."""
    import torch.nn.functional as F

    from tests.test_torch_parity import _torch_encode_text

    a, sd, classes, l2i, labels, _ = ab_setup
    loss_log = []
    VisualPrompt, sched_mod = _reference_prompt_cls(
        a, sd, monkeypatch, loss_log, modality="image"
    )

    cfgNS = types.SimpleNamespace(
        EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine", LR=LR,
        DECAY=DECAY, STEP_SIZE=1, PREFIX_SIZE=4, MEAN_INIT=0.0, VAR_INIT=0.02,
        PROMPT_TEMPLATE="a photo of a {}",
    )
    ref = VisualPrompt(cfgNS, l2i, classes, classes, classes, "cpu")

    cfg = Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=B, PREFIX_SIZE=4, LR=LR,
        DECAY=DECAY, EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine",
        ACCUMULATION_ITER=ACCUM, PROMPT_TEMPLATE="a photo of a {}",
        MODALITY="image",
    )
    rt = ClipRuntime(cfg)
    arch, params = convert_state_dict(sd)
    rt.params = params
    from menghini_neurips23_tpu.training import VisualStrategy

    strat = VisualStrategy(cfg, l2i, classes, classes, classes, runtime=rt)
    prefix0 = np.asarray(strat.prompt["prefix"]).copy()

    # identical inputs on both sides: raw images for the reference, the
    # conv+CLS+pos tokens of the SAME images for our cached-token step
    R = a.image_resolution
    imgs = np.random.default_rng(5).normal(size=(N, 3, R, R)).astype(np.float32)
    x = F.conv2d(
        torch.from_numpy(imgs), torch.from_numpy(sd["visual.conv1.weight"]),
        stride=a.vision_patch_size,
    )
    Bn, W = x.shape[0], x.shape[1]
    x = x.reshape(Bn, W, -1).permute(0, 2, 1)
    cls = torch.from_numpy(sd["visual.class_embedding"]).expand(Bn, 1, W)
    tokens = (
        torch.cat([cls, x], dim=1)
        + torch.from_numpy(sd["visual.positional_embedding"])
    ).numpy()

    # frozen text features: the reference re-encodes the templated prompts
    # (visual_prompt.py define_textual_prompts) - same oracle, same ids
    prompts = [cfg.PROMPT_TEMPLATE.format(" ".join(c.split("_"))) for c in classes]
    ids = rt.tokenizer.tokenize(prompts, context_length=a.context_length)
    tf = _torch_encode_text(sd, a, torch.from_numpy(ids).long())
    tf = (tf / tf.norm(dim=-1, keepdim=True)).numpy().astype(np.float32)

    ref.model = sys.modules["_ref_prompts_models"].ImagePrefixModel(
        torch.from_numpy(prefix0).clone(), ref.image_encoder, device="cpu"
    )
    ref.training_model = ref.model  # single-process accelerate prepare
    ref.optimizer = torch.optim.SGD(
        [ref.model.prefix], lr=LR, weight_decay=DECAY, momentum=0.0
    )
    ref.scheduler = sched_mod.make_scheduler(ref.optimizer, cfgNS)
    loader = torch.utils.data.DataLoader(
        _FeatDataset(imgs, labels), batch_size=B, shuffle=False
    )
    loss = total = 0.0
    for e in range(EPOCHS):
        assert ref.optimizer.param_groups[0]["lr"] == pytest.approx(
            lr_for_epoch(cfg, e), abs=1e-12
        )
        loss, total, _ = ref._train_epoch(
            loss, total, loader, accum_iter=ACCUM, epoch=e, only_seen=True
        )
    prefix_ref = ref.model.prefix.detach().numpy()
    if prefix_ref.ndim == 3:
        prefix_ref = prefix_ref[0]

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
                step, tf, lr, tokens[sl], labels[sl].astype(np.int32),
                group, valid, apply=apply,
            )
            losses_ours.append(l)
    prefix_ours = np.asarray(strat.prompt["prefix"])

    np.testing.assert_allclose(losses_ours, loss_log, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(prefix_ours, prefix_ref, rtol=1e-3, atol=1e-5)
    assert np.abs(prefix_ours - prefix0).max() > 1e-4


class _QuickGELU(torch.nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _StubMLP(torch.nn.Module):
    def __init__(self, w):
        super().__init__()
        self.c_fc = torch.nn.Linear(w, 4 * w)
        self.gelu = _QuickGELU()
        self.c_proj = torch.nn.Linear(4 * w, w)

    def forward(self, x):
        return self.c_proj(self.gelu(self.c_fc(x)))


class _StubResBlock(torch.nn.Module):
    def __init__(self, w, heads):
        super().__init__()
        self.attn = torch.nn.MultiheadAttention(w, heads)
        self.ln_1 = torch.nn.LayerNorm(w, eps=1e-5)
        self.mlp = _StubMLP(w)
        self.ln_2 = torch.nn.LayerNorm(w, eps=1e-5)

    def forward(self, x):
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        return x + self.mlp(self.ln_2(x))


class _StubTransformer(torch.nn.Module):
    """Stands in for the pip clip package's clip.model.Transformer, which
    UPTModel instantiates as its TRAINABLE mixer (reference
    prompts_models.py:116-119).  Same architecture (pre-LN residual blocks,
    QuickGELU), same state_dict key layout (resblocks.N....)."""

    def __init__(self, width, layers, heads, attn_mask=None):
        super().__init__()
        self.resblocks = torch.nn.ModuleList(
            [_StubResBlock(width, heads) for _ in range(layers)]
        )

    def forward(self, x):
        for b in self.resblocks:
            x = b(x)
        return x


@pytest.mark.parametrize("fp16_quirk", [False, True])
def test_reference_upt_trainer_matches_ours(ab_setup, monkeypatch, fp16_quirk):
    """UPT A/B: the reference's published UPTModel.forward (joint mixer over
    both prompt sets, reference prompts_models.py:129-154) + the multimodal
    _train_epoch body, with the trainable mixer seeded from OUR init.

    Tolerances are looser than the textual/visual A/Bs because the published
    forward round-trips the mixer output through fp16 (prompts_models.py:141,
    the reference's own 'TODO: Fix hacky type change') while our mixer stays
    fp32 - a deliberate non-replication (PARITY.md): the cast injects ~6e-4
    relative noise and buys nothing on TPU."""
    a, sd, classes, l2i, labels, _ = ab_setup
    loss_log = []
    MultimodalPrompt, sched_mod = _reference_prompt_cls(
        a, sd, monkeypatch, loss_log, modality="multi"
    )
    pm = sys.modules["_ref_prompts_models"]

    cfgNS = types.SimpleNamespace(
        EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine", LR=LR,
        DECAY=DECAY, STEP_SIZE=1, PREFIX_SIZE=4, TEXT_PREFIX_SIZE=2,
        VISION_PREFIX_SIZE=2, TRANSFORMER_DIM=16, MEAN_INIT=0.0,
        VAR_INIT=0.02, PROMPT_TEMPLATE="a photo of a {}",
    )
    ref = MultimodalPrompt(cfgNS, l2i, classes, classes, classes, "cpu")

    cfg = Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=B, TEXT_PREFIX_SIZE=2,
        VISION_PREFIX_SIZE=2, TRANSFORMER_DIM=16, LR=LR, DECAY=DECAY,
        EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine",
        ACCUMULATION_ITER=ACCUM, PROMPT_TEMPLATE="a photo of a {}",
        MODALITY="multi", UPT_FP16_QUIRK=fp16_quirk,
    )
    rt = ClipRuntime(cfg)
    arch, params = convert_state_dict(sd)
    rt.params = params
    from menghini_neurips23_tpu.evaluation import interop
    from menghini_neurips23_tpu.training import MultimodalStrategy

    strat = MultimodalStrategy(cfg, l2i, classes, classes, classes, runtime=rt)
    parts0 = strat.epoch_parameters()

    # identical inputs: raw images for the reference conv tower, their
    # conv+CLS+pos tokens for our cached-token step
    import torch.nn.functional as F

    R = a.image_resolution
    imgs = np.random.default_rng(7).normal(size=(N, 3, R, R)).astype(np.float32)
    x = F.conv2d(
        torch.from_numpy(imgs), torch.from_numpy(sd["visual.conv1.weight"]),
        stride=a.vision_patch_size,
    )
    Bn, W = x.shape[0], x.shape[1]
    x = x.reshape(Bn, W, -1).permute(0, 2, 1)
    cls = torch.from_numpy(sd["visual.class_embedding"]).expand(Bn, 1, W)
    tokens = (
        torch.cat([cls, x], dim=1)
        + torch.from_numpy(sd["visual.positional_embedding"])
    ).numpy()

    # published UPTModel, mixer/projections/prefixes seeded from OUR init
    text_enc = sys.modules["_ref_clip_encoders"].CustomTextEncoder(
        ref.clip_model, "cpu", torch.float32
    )
    image_enc = sys.modules["_ref_clip_encoders"].CustomImageEncoder(
        _FakeVisionTransformer(sd, a)
    )
    ref.model = pm.UPTModel(
        torch.tensor(np.asarray(parts0[5]))[None],
        torch.tensor(np.asarray(parts0[7]))[None],
        None, image_enc, text_enc, classes, 16, device="cpu",
        dtype=torch.float32,
    )
    ref.model.transformer.load_state_dict(interop.multi_part_to_torch(0, parts0[0]))
    ref.model.proj_coop_pre.load_state_dict(
        {k: torch.as_tensor(v) for k, v in interop.multi_part_to_torch(1, parts0[1]).items()}
    )
    ref.model.proj_coop_post.load_state_dict(
        {k: torch.as_tensor(v) for k, v in interop.multi_part_to_torch(2, parts0[2]).items()}
    )
    ref.model.proj_vpt_pre.load_state_dict(
        {k: torch.as_tensor(v) for k, v in interop.multi_part_to_torch(3, parts0[3]).items()}
    )
    ref.model.proj_vpt_post.load_state_dict(
        {k: torch.as_tensor(v) for k, v in interop.multi_part_to_torch(4, parts0[4]).items()}
    )
    trainable = [p for p in ref.model.parameters() if p.requires_grad]
    ref.optimizer = torch.optim.SGD(trainable, lr=LR, weight_decay=DECAY, momentum=0.0)
    ref.scheduler = sched_mod.make_scheduler(ref.optimizer, cfgNS)
    loader = torch.utils.data.DataLoader(
        _FeatDataset(imgs, labels), batch_size=B, shuffle=False
    )
    loss = total = 0.0
    for e in range(EPOCHS):
        assert ref.optimizer.param_groups[0]["lr"] == pytest.approx(
            lr_for_epoch(cfg, e), abs=1e-12
        )
        loss, total, _ = ref._train_epoch(
            loss, total, loader, accum_iter=ACCUM, epoch=e, only_seen=True
        )
    coop_ref = ref.model.coop_embeddings.detach().numpy()[0]
    vpt_ref = ref.model.vpt_embeddings.detach().numpy()[0]

    step = strat._make_step(C)
    ids = strat._train_text_class_ids(classes).astype(np.int32)
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
                step, ids, lr, tokens[sl], labels[sl].astype(np.int32),
                group, valid, apply=apply,
            )
            losses_ours.append(l)

    # UPT_FP16_QUIRK=True replicates the published fp16 round-trip exactly,
    # so the A/B tightens to the other modalities' fp32 tolerances; with the
    # default fp32 mixer the fp16 cast bounds the gap instead
    lt = (5e-4, 5e-4) if fp16_quirk else (5e-3, 5e-3)
    pt = (2e-3, 5e-5) if fp16_quirk else (2e-2, 2e-4)
    np.testing.assert_allclose(losses_ours, loss_log, rtol=lt[0], atol=lt[1])
    np.testing.assert_allclose(
        np.asarray(strat.upt_params["coop"]), coop_ref, rtol=pt[0], atol=pt[1]
    )
    np.testing.assert_allclose(
        np.asarray(strat.upt_params["vpt"]), vpt_ref, rtol=pt[0], atol=pt[1]
    )


def test_reference_fpl_loss_policy_matches_ours(ab_setup, monkeypatch):
    """FPL A/B: the reference's PUBLISHED two-group pseudolabel loss
    (TextualFPL.define_loss_function/cross_entropy, reference
    textual_fpl.py:123-164: balance_param * CE(labeled) + CE(pseudo), group
    membership by path-in-unlabeled-set, empty group contributes 0) driven
    through the published _train_epoch, against our two_group_loss fused step
    with the SSL policy weights (SPEC #8/#9)."""
    a, sd, classes, l2i, _, feats = ab_setup
    loss_log = []
    TextualFPL, sched_mod = _reference_prompt_cls(
        a, sd, monkeypatch, loss_log, modality="text", fpl=True
    )

    # interleave labeled/pseudo so every batch exercises BOTH loss terms
    paths = [
        (f"lab{i}.png" if i % 2 == 0 else f"unl{i}.png") for i in range(N)
    ]
    pseudo_set = {p for p in paths if p.startswith("unl")}
    labels = np.random.default_rng(9).integers(0, C, N).astype(np.int64)

    cfgNS = types.SimpleNamespace(
        EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine", LR=LR,
        DECAY=DECAY, STEP_SIZE=1, PREFIX_SIZE=4, MEAN_INIT=0.0, VAR_INIT=0.02,
        PROMPT_TEMPLATE="a photo of a {}",
    )
    ref = TextualFPL(cfgNS, l2i, ".", pseudo_set, classes, classes, classes, "cpu")

    cfg = Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=B, PREFIX_SIZE=4, LR=LR,
        DECAY=DECAY, EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine",
        ACCUMULATION_ITER=ACCUM, PROMPT_TEMPLATE="a photo of a {}",
        TEXT_TRUNCATE=False, LEARNING_PARADIGM="ssl",
    )
    rt = ClipRuntime(cfg)
    arch, params = convert_state_dict(sd)
    rt.params = params
    strat = TextualStrategy(cfg, l2i, classes, classes, classes, runtime=rt)
    strat._set_loss_policy(n_pseudo=N // 2, n_labeled=N // 2)
    prefix0 = np.asarray(strat.prefix).copy()

    # the unpublished base sets balance_param; SPEC freezes it to the SSL
    # ratio - hand the published loss the same value our policy computed
    ref.balance_param = strat.balance_param
    orig_dlf = ref.define_loss_function

    def logged_dlf(logits, labs, img_paths):
        out = orig_dlf(logits, labs, img_paths)
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
        _FeatDataset(feats, labels, paths), batch_size=B, shuffle=False
    )
    loss = total = 0.0
    for e in range(EPOCHS):
        loss, total, _ = ref._train_epoch(
            loss, total, loader, accum_iter=ACCUM, epoch=e, only_seen=False
        )
    prefix_ref = ref.model.prefix.detach().numpy()[0]

    # ours: group 0 = labeled (w0 = balance), group 1 = pseudo (w1 = 1)
    ids = build_prompt_token_ids(rt.tokenizer, classes, cfg.PREFIX_SIZE)
    step = strat._make_step(C)
    group_all = np.asarray([0 if p.startswith("lab") else 1 for p in paths], np.int32)
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
                labels[sl].astype(np.int32), group_all[sl], valid, apply=apply,
            )
            losses_ours.append(l)
    prefix_ours = np.asarray(strat.prefix)

    np.testing.assert_allclose(losses_ours, loss_log, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(prefix_ours, prefix_ref, rtol=1e-3, atol=1e-5)


class _TestFeatDataset(torch.utils.data.Dataset):
    """The reference's TEST-split dataset surface: 4-tuple items
    (img, aug1, aug2, path) plus .filepaths and a settable .transform
    (test_predictions assigns self.transform before loading)."""

    def __init__(self, feats, paths):
        self.feats, self.filepaths = feats, list(paths)
        self.transform = None

    def __len__(self):
        return len(self.filepaths)

    def __getitem__(self, i):
        return torch.from_numpy(self.feats[i]), 0, 0, self.filepaths[i]


def test_reference_test_predictions_matches_ours(ab_setup, monkeypatch):
    """Eval-path A/B: the reference's published test_predictions (reference
    textual_prompt.py:226-297 - prompted text features once, batched frozen
    image features, argmax -> label_to_idx -> classes round-trip, gather,
    drop_duplicates) executed verbatim against our test_predictions on the
    same weights/features.  Unique filenames make the reference's
    drop_duplicates a no-op (we deliberately do exact unpadding instead,
    SPEC #12)."""
    a, sd, classes, l2i, _, feats = ab_setup
    loss_log = []
    TextualPrompt, _ = _reference_prompt_cls(a, sd, monkeypatch, loss_log)

    cfgNS = types.SimpleNamespace(
        EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine", LR=LR,
        DECAY=DECAY, STEP_SIZE=1, PREFIX_SIZE=4, MEAN_INIT=0.0, VAR_INIT=0.02,
        PROMPT_TEMPLATE="a photo of a {}", BATCH_SIZE=B,
    )
    ref = TextualPrompt(cfgNS, l2i, classes, classes, classes, "cpu")
    ref.transform = None  # unpublished-base attr consumed by test_predictions

    cfg = Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=B, PREFIX_SIZE=4, LR=LR,
        DECAY=DECAY, EPOCHS=EPOCHS, PROMPT_TEMPLATE="a photo of a {}",
        TEXT_TRUNCATE=False, LEARNING_PARADIGM="ssl",
    )
    rt = ClipRuntime(cfg)
    arch, params = convert_state_dict(sd)
    rt.params = params
    strat = TextualStrategy(cfg, l2i, classes, classes, classes, runtime=rt)
    prefix0 = np.asarray(strat.prefix).copy()

    ref.model = sys.modules["_ref_prompts_models"].TextPrefixModel(
        torch.from_numpy(prefix0).clone()[None], ref.text_encoder, classes,
        device="cpu",
    )

    paths = [f"t{i}.png" for i in range(N)]
    ds_ref = _TestFeatDataset(feats, paths)
    with torch.no_grad():
        df_ref = ref.test_predictions(ds_ref, standard_zsl=False)

    class DS:
        filepaths = list(paths)
        labels = [0] * N
        label_id = True
        label_map = l2i
        transform = None

        def label_ids(self):
            return [0] * N

    strat._features_for_paths = lambda p, cache=True: np.stack(
        [feats[paths.index(x.split("/")[-1])] for x in p]
    )
    df_ours = strat.test_predictions(DS(), standard_zsl=False)

    assert list(df_ref["id"]) == [p.split("/")[-1] for p in df_ours["id"]]
    assert list(df_ref["class"]) == list(df_ours["class"])


def test_reference_trzsl_fpl_loss_policy_matches_ours(ab_setup, monkeypatch):
    """TRZSL paradigm A/B: the published transductive-ZSL FPL loss
    (reference transductive_zsl/textual_fpl.py:117-147: CE(seen-labeled
    samples) + balance * CE(unseen-pseudo samples), group membership by
    LABEL-in-class-set) driven through the published TRZSL _train_epoch,
    against our two_group_loss step with the TRZSL policy (w0=1,
    w1=balance)."""
    a, sd, _, _, _, feats = ab_setup
    loss_log = []
    TextualFPL, sched_mod = _reference_prompt_cls(
        a, sd, monkeypatch, loss_log, modality="text", fpl=True,
        paradigm="transductive_zsl",
    )

    classes = [f"c{i}" for i in range(4)]
    seen, unseen = classes[:2], classes[2:]
    l2i = {c: i for i, c in enumerate(classes)}
    # labeled rows carry seen labels, pseudo rows unseen labels (TRZSL group
    # membership is label-in-set; for the constructed sets it equals origin)
    lab_rng = np.random.default_rng(13)
    labels = np.asarray(
        [lab_rng.integers(0, 2) if i % 2 == 0 else 2 + lab_rng.integers(0, 2)
         for i in range(N)], np.int64,
    )

    cfgNS = types.SimpleNamespace(
        EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine", LR=LR,
        DECAY=DECAY, STEP_SIZE=1, PREFIX_SIZE=4, MEAN_INIT=0.0, VAR_INIT=0.02,
        PROMPT_TEMPLATE="a photo of a {}",
    )
    ref = TextualFPL(cfgNS, l2i, ".", classes, seen, unseen, "cpu")

    cfg = Config(
        VIS_ENCODER="tiny-test", BATCH_SIZE=B, PREFIX_SIZE=4, LR=LR,
        DECAY=DECAY, EPOCHS=EPOCHS, WARMUP_EPOCHS=WARMUP, SCHEDULER="cosine",
        ACCUMULATION_ITER=ACCUM, PROMPT_TEMPLATE="a photo of a {}",
        TEXT_TRUNCATE=False, LEARNING_PARADIGM="trzsl",
    )
    rt = ClipRuntime(cfg)
    arch, params = convert_state_dict(sd)
    rt.params = params
    strat = TextualStrategy(cfg, l2i, classes, seen, unseen, runtime=rt)
    strat._set_loss_policy(n_pseudo=N // 2, n_labeled=N // 2)
    assert strat._w0 == 1.0 and strat._w1 == strat.balance_param
    prefix0 = np.asarray(strat.prefix).copy()

    ref.balance_param = strat.balance_param
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
        loss, total, _ = ref._train_epoch(
            loss, total, loader, accum_iter=ACCUM, epoch=e, only_seen=False
        )
    prefix_ref = ref.model.prefix.detach().numpy()[0]

    # ours: group 0 = labeled/seen (w0=1), group 1 = pseudo/unseen (w1=balance)
    ids = build_prompt_token_ids(rt.tokenizer, classes, cfg.PREFIX_SIZE)
    step = strat._make_step(len(classes))
    group_all = np.asarray([0 if i % 2 == 0 else 1 for i in range(N)], np.int32)
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
                labels[sl].astype(np.int32), group_all[sl], valid, apply=apply,
            )
            losses_ours.append(l)
    prefix_ours = np.asarray(strat.prefix)

    np.testing.assert_allclose(losses_ours, loss_log, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(prefix_ours, prefix_ref, rtol=1e-3, atol=1e-5)
