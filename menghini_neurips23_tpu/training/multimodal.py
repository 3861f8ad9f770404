"""Multimodal prompt tuning (UPT) - reference methods/*/multimodal_prompt.py
and multimodal_fpl.py, all three paradigms.

Trainable pytree: coop prompts + vpt prompts + the 1-layer mixer transformer
with its four projections (reference models/prompts_models.py:99-119).  Both
prompted towers run per step (the prompts feed both), but the vision tower's
patchify+pos stage is cached per image like VPT, and the text tower runs only
over C class prompts.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from menghini_neurips23_tpu.models.prompts import (
    UPTMixer,
    build_prompt_token_ids,
    coop_text_features,
    init_upt_params,
    vision_tokens_with_prefix,
)
from menghini_neurips23_tpu.training.strategy import TrainingStrategy


class MultimodalStrategy(TrainingStrategy):
    MODALITY = "multi"

    def initialize_prompts_parameters(self):
        cfg = self.config
        arch = self.runtime.arch
        self._reinit = getattr(self, "_reinit", -1) + 1
        key = jax.random.PRNGKey(cfg.OPTIM_SEED * 1000 + self._reinit)
        self.mixer = UPTMixer(
            arch.transformer_width, arch.vision_width, cfg.TRANSFORMER_DIM
        )
        self.upt_params = init_upt_params(key, cfg, arch)
        self._init_opt_state()

    def _get_prompt_tree(self):
        return self.upt_params

    def _set_prompt_tree(self, tree):
        self.upt_params = tree

    def _logits_fn(self):
        model = self.runtime.model
        mixer = self.mixer

        def fn(clip_params, upt_params, token_ids, tokens):
            scale = jnp.exp(clip_params["params"]["logit_scale"])
            coop_o, vpt_o = mixer.apply(
                upt_params["mixer"], upt_params["coop"], upt_params["vpt"]
            )
            tf = coop_text_features(model, clip_params, coop_o, token_ids)
            tf = tf.astype(jnp.float32)
            tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
            x = vision_tokens_with_prefix(tokens, vpt_o)
            img = model.apply(
                clip_params, x, upt_params.get("deep"),
                method="vision_encode_tokens",
            )
            img = img.astype(jnp.float32)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            return scale * img @ tf.T

        return fn

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
        return build_prompt_token_ids(
            self.runtime.tokenizer, class_list, self.config.TEXT_PREFIX_SIZE
        )

    # ------------------------------------------------------------ fused train
    def _fused_train(self, epoch, val, train_classes):
        """Whole-run fused UPT training: every epoch runs both prompted towers
        per step (mixer -> coop prefix -> text tower over C classes; vpt
        prefix -> vision tower over cached patch tokens) inside one jitted
        nested lax.scan; per-epoch UPT pytree snapshots come back for
        host-side best-val selection (see TextualStrategy._fused_train)."""
        cfg = self.config
        if not cfg.FUSED_TRAIN or len(epoch) == 0 or cfg.ACCUMULATION_ITER != 1 or not self._fused_val_ok(val) or not self._fused_fits(epoch):
            return None
        inp = self._fused_train_inputs(epoch, val)
        ids_train = jnp.asarray(self._train_text_class_ids(train_classes))
        ids_val = jnp.asarray(self._train_text_class_ids(inp["val_class_list"]))
        val_is_seen = np.isin(inp["val_labels"], inp["seen_ids"]).astype(np.float32)

        key = (
            inp["steps"], inp["bs"], cfg.EPOCHS, inp["n_slot"],
            ids_train.shape[0], ids_val.shape[0], len(inp["val_labels"]),
            inp["trzsl_hmean"], "deep" in self.upt_params,
        )
        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}
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
                self.runtime.params, prompt, ids_train, ids_val,
                feats_d, labels_d, groups_d,
                jnp.asarray(perms_c), jnp.asarray(lrs_c), *vals,
                jnp.float32(self._w0), jnp.float32(self._w1),
                jnp.float32(inp["n"]), mom,
            )

        metrics, prompts, train_accs, losses = self._fused_chunked_call(
            call, self.upt_params, jax.tree.map(jnp.zeros_like, self.upt_params),
            inp["perms"], inp["lrs"], cfg.EPOCHS,
        )
        metrics = np.asarray(metrics)
        best = int(np.argmax(metrics))
        # live model keeps FINAL-epoch weights; returned params = best-val
        self.upt_params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[-1]), prompts)
        self._init_opt_state()
        best_tree = jax.tree.map(lambda x: np.asarray(x)[best], prompts)
        saved = dict(self.upt_params)
        self.upt_params = best_tree
        out = self.epoch_parameters()
        self.upt_params = saved
        import logging

        logging.getLogger(__name__).info(
            "fused UPT train: %d epochs, best epoch %d val=%.4f",
            cfg.EPOCHS, best, metrics[best],
        )
        return float(metrics[best]), out

    def _build_fused_train(self, steps: int, bs: int, n_slot: int, trzsl: bool):
        model = self.runtime.model
        mixer = self.mixer
        wd = self.config.DECAY
        momentum = self.config.MOMENTUM
        remat = self.config.FUSED_REMAT

        @jax.jit
        def fused(clip_params, upt0, ids_train, ids_val, tokens, labels,
                  groups, perms, lrs, val_tokens, val_labels, val_global,
                  val_is_seen, w0, w1, n_real, mom0):
            scale = jnp.exp(clip_params["params"]["logit_scale"])

            def features(upt_params, ids, toks):
                coop_o, vpt_o = mixer.apply(
                    upt_params["mixer"], upt_params["coop"], upt_params["vpt"]
                )
                tf = coop_text_features(model, clip_params, coop_o, ids)
                tf = tf.astype(jnp.float32)
                tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
                x = vision_tokens_with_prefix(toks, vpt_o)
                img = model.apply(
                    clip_params, x, upt_params.get("deep"),
                    method="vision_encode_tokens",
                )
                img = img.astype(jnp.float32)
                img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
                return tf, img

            if remat:
                features = jax.checkpoint(features, static_argnums=())

            def epoch_fn(carry, xs):
                upt, mom = carry
                perm, lr = xs
                idx = jnp.clip(perm, 0, n_slot - 1)
                tb = tokens[idx].reshape((steps, bs) + tokens.shape[1:])
                lb = jnp.where(perm >= 0, labels[idx], -1).reshape(steps, bs)
                gb = groups[idx].reshape(steps, bs)
                vb = (perm >= 0).astype(jnp.float32).reshape(steps, bs)

                def step(carry, batch):
                    upt, mom = carry
                    t, l, g_, v = batch

                    def loss_fn(upt):
                        tf, img = features(upt, ids_train, t)
                        logits = scale * img @ tf.T
                        from menghini_neurips23_tpu.training.losses import two_group_loss

                        return two_group_loss(logits, l, g_, v, w0, w1), logits

                    (loss, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(upt)
                    g = jax.tree.map(lambda gg, p: gg + wd * p, g, upt)
                    # all-pad batches (fixed-shape bucketing) are no-ops
                    has_valid = v.sum() > 0
                    mom_new = jax.tree.map(
                        lambda m, gg: jnp.where(has_valid, momentum * m + gg, m), mom, g
                    )
                    upt_new = jax.tree.map(
                        lambda p, m: jnp.where(has_valid, p - lr * m, p), upt, mom_new
                    )
                    correct = ((logits.argmax(1) == l) * v).sum()
                    return (upt_new, mom_new), (loss, correct)

                (upt, mom), (losses, corrects) = jax.lax.scan(
                    step, (upt, mom), (tb, lb, gb, vb)
                )
                tf_v, img_v = features(upt, ids_val, val_tokens)
                vpred = (img_v @ tf_v.T).argmax(1)
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
                return (upt, mom), (metric, upt, train_acc, losses[-1])

            (pf, mf), outs = jax.lax.scan(epoch_fn, (upt0, mom0), (perms, lrs))
            return outs, pf, mf

        return fused

    # ----------------------------------------------------------- inference
    @functools.cached_property
    def _feats_fn(self):
        model = self.runtime.model
        mixer = self.mixer

        @jax.jit
        def fn(clip_params, upt_params, token_ids, tokens):
            coop_o, vpt_o = mixer.apply(
                upt_params["mixer"], upt_params["coop"], upt_params["vpt"]
            )
            tf = coop_text_features(model, clip_params, coop_o, token_ids)
            tf = tf.astype(jnp.float32)
            tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
            x = vision_tokens_with_prefix(tokens, vpt_o)
            img = model.apply(
                clip_params, x, upt_params.get("deep"),
                method="vision_encode_tokens",
            )
            img = img.astype(jnp.float32)
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            return tf, img

        return fn

    def _predict_logits(self, paths, class_list, batch: int = 256):
        ids = jnp.asarray(self._train_text_class_ids(class_list))
        out = []
        for s in range(0, len(paths), batch):
            toks = self._features_for_paths(paths[s : s + batch], cache=False)
            tf, img = self._feats_fn(
                self.runtime.params, self.upt_params, ids, jnp.asarray(toks)
            )
            out.append(self.runtime.logit_scale * np.asarray(img) @ np.asarray(tf).T)
        return np.concatenate(out) if out else np.empty((0, len(class_list)))

    # ------------------------------------------------------------- persist
    def epoch_parameters(self):
        """Reference 8-artifact order (utils/compute_metrics.py:119-143):
        [transformer, proj_coop_pre, proj_coop_post, proj_vpt_pre,
         proj_vpt_post, coop_embeddings, deep_vpt, vpt_embeddings]."""
        m = jax.tree.map(np.asarray, self.upt_params["mixer"]["params"])
        return [
            m["transformer"],
            m["proj_coop_pre"],
            m["proj_coop_post"],
            m["proj_vpt_pre"],
            m["proj_vpt_post"],
            np.asarray(self.upt_params["coop"]),
            np.asarray(self.upt_params["deep"]) if "deep" in self.upt_params else None,
            np.asarray(self.upt_params["vpt"]),
        ]

    def load_parameters(self, params):
        mixer_params = {
            "params": {
                "transformer": params[0],
                "proj_coop_pre": params[1],
                "proj_coop_post": params[2],
                "proj_vpt_pre": params[3],
                "proj_vpt_post": params[4],
            }
        }
        self.upt_params = {
            "coop": jnp.asarray(params[5]),
            "vpt": jnp.asarray(params[7]),
            "mixer": jax.tree.map(jnp.asarray, mixer_params),
        }
        if params[6] is not None:
            self.upt_params["deep"] = jnp.asarray(params[6])
        self._init_opt_state()
