"""Visual prompt tuning (VPT) - reference methods/*/visual_prompt.py and
visual_fpl.py, all three paradigms.

TPU design: text features are frozen (template prompts through the frozen
text tower) and computed ONCE per class list (the reference recomputes them
every epoch, visual_prompt.py:111-118); the patchify+pos-embed stage of the
vision tower is prompt-independent and cached per image, so each train step
runs only ln_pre -> transformer -> head over (B, 1+L+N, width) with grads to
the (L, width) prefix.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from menghini_neurips23_tpu.models.prompts import (
    init_deep_prefix,
    init_prefix,
    vision_tokens_with_prefix,
)
from menghini_neurips23_tpu.training.losses import two_group_loss
from menghini_neurips23_tpu.training.strategy import TrainingStrategy


class VisualStrategy(TrainingStrategy):
    MODALITY = "image"

    def initialize_prompts_parameters(self):
        cfg = self.config
        arch = self.runtime.arch
        self._reinit = getattr(self, "_reinit", -1) + 1
        key = jax.random.PRNGKey(cfg.OPTIM_SEED * 1000 + self._reinit)
        k1, k2 = jax.random.split(key)
        self.prompt = {
            "prefix": init_prefix(
                k1, cfg.PREFIX_SIZE, arch.vision_width,
                cfg.VIS_PREFIX_INIT, cfg.MEAN_INIT, cfg.VAR_INIT,
            )
        }
        if cfg.VPT_DEEP:
            # working deep VPT (the reference's deep branch is dead code;
            # see models/clip.py Transformer deep_prompts)
            self.prompt["deep"] = init_deep_prefix(
                k2, arch.vision_layers - 1, cfg.PREFIX_SIZE, arch.vision_width,
                cfg.VIS_PREFIX_INIT, cfg.MEAN_INIT, cfg.VAR_INIT,
            )
        self._init_opt_state()
        self._text_feat_cache = {}
        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}

    def _get_prompt_tree(self):
        return self.prompt

    def _set_prompt_tree(self, tree):
        self.prompt = tree

    def _logits_fn(self):
        model = self.runtime.model

        def fn(clip_params, prompt, text_feats, tokens):
            scale = jnp.exp(clip_params["params"]["logit_scale"])
            x = vision_tokens_with_prefix(tokens, prompt["prefix"])
            img = model.apply(
                clip_params, x, prompt.get("deep"), method="vision_encode_tokens"
            )
            img = img.astype(jnp.float32)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            return scale * img @ text_feats.astype(jnp.float32).T

        return fn

    @property
    def prefix(self):
        return self.prompt["prefix"]

    # ------------------------------------------------------------ features
    def _features_for_paths(self, paths: Sequence[str], cache: bool = True) -> np.ndarray:
        """Pos-embedded CLS+patch tokens (N, 1+P, width).  Patch tokens are
        ~150KB/image, so only training/validation paths are cached; large
        inference pools (cache=False callers) stream through."""
        missing = [p for p in paths if p not in self._feat_cache]
        computed = {}
        if missing:
            toks = self.runtime.vision_tokens_from_files(missing)
            for p, t in zip(missing, toks):
                if cache:
                    self._feat_cache[p] = t
                else:
                    computed[p] = t
        if not paths:
            return np.empty((0,))
        return np.stack(
            [self._feat_cache.get(p, computed.get(p)) for p in paths]
        )

    def _train_text_class_ids(self, class_list: Sequence[str]) -> np.ndarray:
        """Frozen normalized text features for template prompts (reference
        visual_prompt.py:53-63 define_textual_prompts + encode_text)."""
        key = tuple(class_list)
        if key not in self._text_feat_cache:
            self._text_feat_cache[key] = self._zero_shot_text_features(class_list)
        return self._text_feat_cache[key]

    # ------------------------------------------------------------ fused train
    def _fused_train(self, epoch, val, train_classes):
        """Whole-run fused VPT training: all epochs of prompted-vision-tower
        steps + per-epoch validation in one jitted nested lax.scan (see
        TextualStrategy._fused_train for the design; here the per-step work is
        the vision transformer over cached patch tokens and the frozen text
        features are constants)."""
        cfg = self.config
        if not cfg.FUSED_TRAIN or len(epoch) == 0 or cfg.ACCUMULATION_ITER != 1 or not self._fused_val_ok(val) or not self._fused_fits(epoch):
            return None
        inp = self._fused_train_inputs(epoch, val)
        text_train = jnp.asarray(self._train_text_class_ids(train_classes))
        text_val = jnp.asarray(self._train_text_class_ids(inp["val_class_list"]))
        val_is_seen = np.isin(inp["val_labels"], inp["seen_ids"]).astype(np.float32)

        key = (
            inp["steps"], inp["bs"], cfg.EPOCHS, inp["n_slot"],
            text_train.shape[0], text_val.shape[0], len(inp["val_labels"]),
            inp["trzsl_hmean"], "deep" in self.prompt,
        )
        fn = self._fused_cache.get(key)
        if fn is None:
            fn = self._build_fused_train(
                inp["steps"], inp["bs"], inp["n_slot"], inp["trzsl_hmean"]
            )
            self._fused_cache[key] = fn

        feats_d = jnp.asarray(inp["feats"])
        labels_d = jnp.asarray(inp["labels"])
        groups_d = jnp.asarray(inp["groups"])
        vals = (
            jnp.asarray(inp["val_feats"]), jnp.asarray(inp["val_labels"]),
            jnp.asarray(inp["val_global"]), jnp.asarray(val_is_seen),
        )

        def call(perms_c, lrs_c, prompt, mom):
            return fn(
                self.runtime.params, prompt, text_train, text_val,
                feats_d, labels_d, groups_d,
                jnp.asarray(perms_c), jnp.asarray(lrs_c), *vals,
                jnp.float32(self._w0), jnp.float32(self._w1),
                jnp.float32(inp["n"]), mom,
            )

        import jax as _jax
        metrics, prompts, train_accs, losses = self._fused_chunked_call(
            call, self.prompt, _jax.tree.map(jnp.zeros_like, self.prompt),
            inp["perms"], inp["lrs"], cfg.EPOCHS,
        )
        metrics = np.asarray(metrics)
        best = int(np.argmax(metrics))
        # live model keeps FINAL-epoch weights; returned params = best-val
        # snapshot (reference driver behavior, see TextualStrategy)
        self.prompt = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[-1]), prompts)
        self._init_opt_state()
        best_prompt = jax.tree.map(lambda x: np.asarray(x)[best], prompts)
        out = [np.asarray(best_prompt["prefix"])]
        if "deep" in best_prompt:
            out.append(np.asarray(best_prompt["deep"]))
        import logging

        logging.getLogger(__name__).info(
            "fused VPT train: %d epochs, best epoch %d val=%.4f",
            cfg.EPOCHS, best, metrics[best],
        )
        return float(metrics[best]), out

    def _build_fused_train(self, steps: int, bs: int, n_slot: int, trzsl: bool):
        model = self.runtime.model
        wd = self.config.DECAY
        momentum = self.config.MOMENTUM
        remat = self.config.FUSED_REMAT

        @jax.jit
        def fused(clip_params, prompt0, text_train, text_val, tokens, labels,
                  groups, perms, lrs, val_tokens, val_labels, val_global,
                  val_is_seen, w0, w1, n_real, mom0):
            scale = jnp.exp(clip_params["params"]["logit_scale"])

            def img_feats(prompt, toks):
                x = vision_tokens_with_prefix(toks, prompt["prefix"])
                img = model.apply(
                    clip_params, x, prompt.get("deep"), method="vision_encode_tokens"
                )
                img = img.astype(jnp.float32)
                return img / jnp.linalg.norm(img, axis=-1, keepdims=True)

            if remat:
                # rematerialize the vision tower in the backward pass
                # (jax.checkpoint): trades FLOPs for activation memory
                img_feats = jax.checkpoint(img_feats)

            def epoch_fn(carry, xs):
                prompt, mom = carry
                perm, lr = xs
                idx = jnp.clip(perm, 0, n_slot - 1)
                tb = tokens[idx].reshape((steps, bs) + tokens.shape[1:])
                lb = jnp.where(perm >= 0, labels[idx], -1).reshape(steps, bs)
                gb = groups[idx].reshape(steps, bs)
                vb = (perm >= 0).astype(jnp.float32).reshape(steps, bs)

                def step(carry, batch):
                    prompt, mom = carry
                    t, l, g_, v = batch

                    def loss_fn(prompt):
                        logits = scale * img_feats(prompt, t) @ text_train.T
                        return two_group_loss(logits, l, g_, v, w0, w1), logits

                    (loss, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(prompt)
                    g = jax.tree.map(lambda gg, p: gg + wd * p, g, prompt)
                    # all-pad batches (fixed-shape bucketing) are no-ops
                    has_valid = v.sum() > 0
                    mom_new = jax.tree.map(
                        lambda m, gg: jnp.where(has_valid, momentum * m + gg, m), mom, g
                    )
                    prompt_new = jax.tree.map(
                        lambda p, m: jnp.where(has_valid, p - lr * m, p), prompt, mom_new
                    )
                    correct = ((logits.argmax(1) == l) * v).sum()
                    return (prompt_new, mom_new), (loss, correct)

                (prompt, mom), (losses, corrects) = jax.lax.scan(
                    step, (prompt, mom), (tb, lb, gb, vb)
                )
                vpred = (img_feats(prompt, val_tokens) @ text_val.T).argmax(1)
                correct_v = (val_global[vpred] == val_labels).astype(jnp.float32)
                # padded validation rows (fixed-shape bucketing) carry label -1
                val_valid = (val_labels >= 0).astype(jnp.float32)
                from menghini_neurips23_tpu.training.losses import masked_mean

                if trzsl:
                    acc_s = masked_mean(correct_v, val_is_seen * val_valid)
                    acc_u = masked_mean(correct_v, (1.0 - val_is_seen) * val_valid)
                    metric = jnp.where(
                        (acc_s > 0) & (acc_u > 0),
                        2.0 * acc_s * acc_u / jnp.maximum(acc_s + acc_u, 1e-12),
                        0.0,
                    )
                else:
                    metric = masked_mean(correct_v, val_valid)
                train_acc = corrects.sum() / n_real
                return (prompt, mom), (metric, prompt, train_acc, losses[-1])

            (pf, mf), outs = jax.lax.scan(epoch_fn, (prompt0, mom0), (perms, lrs))
            return outs, pf, mf

        return fused

    # ----------------------------------------------------------- inference
    @functools.cached_property
    def _image_feats_fn(self):
        model = self.runtime.model

        @jax.jit
        def fn(clip_params, prompt, tokens):
            x = vision_tokens_with_prefix(tokens, prompt["prefix"])
            img = model.apply(
                clip_params, x, prompt.get("deep"), method="vision_encode_tokens"
            )
            img = img.astype(jnp.float32)
            return img / jnp.linalg.norm(img, axis=-1, keepdims=True)

        return fn

    def image_features(self, paths: Sequence[str], batch: int = 256) -> np.ndarray:
        """Prompted, normalized image features for a file list."""
        out = []
        for s in range(0, len(paths), batch):
            toks = self._features_for_paths(paths[s : s + batch], cache=False)
            out.append(
                np.asarray(
                    self._image_feats_fn(
                        self.runtime.params, self.prompt, jnp.asarray(toks)
                    ),
                    np.float32,
                )
            )
        return np.concatenate(out) if out else np.empty((0,))

    def _predict_logits(self, paths, class_list):
        tf = self._train_text_class_ids(class_list)  # frozen text features
        img = self.image_features(paths)
        return self.runtime.logit_scale * img @ tf.T

    # ------------------------------------------------------------- persist
    def epoch_parameters(self):
        out = [np.asarray(self.prompt["prefix"])]
        if "deep" in self.prompt:
            out.append(np.asarray(self.prompt["deep"]))
        return out

    def load_parameters(self, params):
        self.prompt = {"prefix": jnp.asarray(params[0])}
        if len(params) > 1 and params[1] is not None:
            self.prompt["deep"] = jnp.asarray(params[1])
        self._init_opt_state()
