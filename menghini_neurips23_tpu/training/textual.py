"""Textual prompt tuning (CoOp) - reference methods/*/textual_prompt.py and
textual_fpl.py, all three paradigms.

TPU design: the frozen image tower runs ONCE per image (features cached,
normalized); each train step is only the text tower over C class prompts +
logits + CE + backward on the (L, width) prefix - fused in one jitted,
donated function.  The reference re-encodes the frozen image batch every step
(textual_prompt.py:100) and barriers every batch (:128); both disappear here.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from menghini_neurips23_tpu.models.prompts import (
    build_prompt_token_ids,
    coop_text_features,
    init_prefix,
)
from menghini_neurips23_tpu.training.losses import two_group_loss
from menghini_neurips23_tpu.training.strategy import TrainingStrategy


class TextualStrategy(TrainingStrategy):
    MODALITY = "text"

    def initialize_prompts_parameters(self):
        cfg = self.config
        arch = self.runtime.arch
        self._reinit = getattr(self, "_reinit", -1) + 1
        key = jax.random.PRNGKey(cfg.OPTIM_SEED * 1000 + self._reinit)
        self.prefix = init_prefix(
            key, cfg.PREFIX_SIZE, arch.transformer_width,
            cfg.VIS_PREFIX_INIT, cfg.MEAN_INIT, cfg.VAR_INIT,
        )
        self._init_opt_state()
        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}

    def _get_prompt_tree(self):
        return self.prefix

    def _set_prompt_tree(self, tree):
        self.prefix = tree

    def _logits_fn(self):
        model = self.runtime.model

        def fn(clip_params, prefix, token_ids, feats):
            scale = jnp.exp(clip_params["params"]["logit_scale"])
            tf = coop_text_features(model, clip_params, prefix, token_ids)
            tf = tf.astype(jnp.float32)
            tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
            return scale * feats.astype(jnp.float32) @ tf.T

        return fn

    # ------------------------------------------------------------ features
    def _features_for_paths(self, paths: Sequence[str]) -> np.ndarray:
        missing = [p for p in paths if p not in self._feat_cache]
        if missing:
            feats = self.runtime.encode_images_from_files(missing, normalize=True)
            for p, f in zip(missing, feats):
                self._feat_cache[p] = f
        return np.stack([self._feat_cache[p] for p in paths]) if paths else np.empty((0,))

    def _train_text_class_ids(self, class_list: Sequence[str]) -> np.ndarray:
        return build_prompt_token_ids(
            self.runtime.tokenizer, class_list, self.config.PREFIX_SIZE
        )

    # ------------------------------------------------------------ fused train
    def _fused_train(self, epoch, val, train_classes):
        """Run the ENTIRE training (all epochs of fused CoOp steps + per-epoch
        validation) as one jitted lax.scan program.

        This is the TPU-native shape of the reference's 150-epoch host loop:
        one dispatch instead of epochs x steps dispatches, zero per-batch host
        sync, with per-epoch prompt snapshots and validation metrics coming
        back as arrays for host-side best-checkpoint selection.  Batch
        composition, lr schedule and loss are identical to the host loop
        (permutations come from the same RNG stream - see the equivalence
        test in tests/test_fused_train.py).
        """
        cfg = self.config
        if not cfg.FUSED_TRAIN or len(epoch) == 0 or cfg.ACCUMULATION_ITER != 1 or not self._fused_val_ok(val) or not self._fused_fits(epoch):
            return None
        inp = self._fused_train_inputs(epoch, val)
        token_train = jnp.asarray(self._train_text_class_ids(train_classes))
        token_val = jnp.asarray(self._train_text_class_ids(inp["val_class_list"]))
        val_is_seen = np.isin(inp["val_labels"], inp["seen_ids"]).astype(np.float32)

        key = (
            inp["steps"], inp["bs"], cfg.EPOCHS, inp["n_slot"],
            token_train.shape[0], token_val.shape[0], len(inp["val_labels"]),
            inp["trzsl_hmean"],
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
                self.runtime.params, prompt, token_train, token_val,
                feats_d, labels_d, groups_d,
                jnp.asarray(perms_c), jnp.asarray(lrs_c), *vals,
                jnp.float32(self._w0), jnp.float32(self._w1),
                jnp.float32(inp["n"]), mom,
            )

        metrics, prefixes, train_accs, losses = self._fused_chunked_call(
            call, self.prefix, jnp.zeros_like(self.prefix),
            inp["perms"], inp["lrs"], cfg.EPOCHS,
        )
        metrics = np.asarray(metrics)
        best = int(np.argmax(metrics))
        prefixes = np.asarray(prefixes)
        # the model keeps FINAL-epoch weights while the returned/saved params
        # are the best-val snapshot - matching the reference, whose strategy
        # object retains last-epoch parameters after train() (main_SSL.py:403
        # runs test_predictions on the live model, not the saved prompt)
        self.prefix = jnp.asarray(prefixes[-1])
        self._init_opt_state()
        import logging

        logging.getLogger(__name__).info(
            "fused train: %d epochs, best epoch %d val=%.4f (final train_acc=%.4f loss=%.4f)",
            cfg.EPOCHS, best, metrics[best],
            float(np.asarray(train_accs)[-1]), float(np.asarray(losses)[-1]),
        )
        return float(metrics[best]), [prefixes[best]]

    def _build_fused_train(self, steps: int, bs: int, n_slot: int, trzsl: bool):
        model = self.runtime.model
        wd = self.config.DECAY
        momentum = self.config.MOMENTUM

        @jax.jit
        def fused(clip_params, prefix0, token_train, token_val, feats, labels,
                  groups, perms, lrs, val_feats, val_labels, val_global,
                  val_is_seen, w0, w1, n_real, mom0):
            scale = jnp.exp(clip_params["params"]["logit_scale"])
            emb_dim = feats.shape[1]

            def text_feats(prefix, ids):
                tf = coop_text_features(model, clip_params, prefix, ids)
                tf = tf.astype(jnp.float32)
                return tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)

            def epoch_fn(carry, xs):
                prefix, mom = carry
                perm, lr = xs
                idx = jnp.clip(perm, 0, n_slot - 1)
                fb = feats[idx].reshape(steps, bs, emb_dim)
                lb = jnp.where(perm >= 0, labels[idx], -1).reshape(steps, bs)
                gb = groups[idx].reshape(steps, bs)
                vb = (perm >= 0).astype(jnp.float32).reshape(steps, bs)

                def step(carry, batch):
                    prefix, mom = carry
                    f, l, g_, v = batch

                    def loss_fn(prefix):
                        tf = text_feats(prefix, token_train)
                        logits = scale * f @ tf.T
                        return two_group_loss(logits, l, g_, v, w0, w1), logits

                    (loss, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(prefix)
                    g = g + wd * prefix
                    # all-pad batches (fixed-shape bucketing) are no-ops
                    has_valid = v.sum() > 0
                    mom_new = jnp.where(has_valid, momentum * mom + g, mom)
                    prefix_new = jnp.where(has_valid, prefix - lr * mom_new, prefix)
                    correct = ((logits.argmax(1) == l) * v).sum()
                    return (prefix_new, mom_new), (loss, correct)

                (prefix, mom), (losses, corrects) = jax.lax.scan(
                    step, (prefix, mom), (fb, lb, gb, vb)
                )
                # per-epoch validation with the updated prompts
                tfv = text_feats(prefix, token_val)
                vpred = (val_feats @ tfv.T).argmax(1)
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
                return (prefix, mom), (metric, prefix, train_acc, losses[-1])

            carry0 = (prefix0, mom0)
            (pf, mf), outs = jax.lax.scan(epoch_fn, carry0, (perms, lrs))
            return outs, pf, mf

        return fused

    # ----------------------------------------------------------- inference
    @functools.cached_property
    def _text_feats_fn(self):
        model = self.runtime.model

        @jax.jit
        def fn(clip_params, prefix, token_ids):
            tf = coop_text_features(model, clip_params, prefix, token_ids)
            tf = tf.astype(jnp.float32)
            return tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)

        return fn

    def text_features(self, class_list: Sequence[str]) -> np.ndarray:
        """Normalized prompted text features (the reference's self.model(classes))."""
        ids = self._train_text_class_ids(class_list)
        return np.asarray(
            self._text_feats_fn(self.runtime.params, self.prefix, jnp.asarray(ids)),
            np.float32,
        )

    def _predict_logits(self, paths, class_list):
        tf = self.text_features(class_list)
        feats = self._features_for_paths(paths)
        return self.runtime.logit_scale * feats @ tf.T

    # ------------------------------------------------------------- persist
    def epoch_parameters(self):
        return [np.asarray(self.prefix)]

    def load_parameters(self, params):
        self.prefix = jnp.asarray(params[0])
        self._init_opt_state()
