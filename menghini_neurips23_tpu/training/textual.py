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
from menghini_neurips23_tpu.parallel import put_batch
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
        self._mom = jnp.zeros_like(self.prefix)

    def _init_opt_state(self):
        self._mom = jnp.zeros_like(self.prefix)

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

    # ---------------------------------------------------------------- step
    def _make_step(self, n_classes: int):
        model = self.runtime.model
        wd = self.config.DECAY
        momentum = self.config.MOMENTUM

        @jax.jit
        def step(clip_params, prefix, mom, lr, token_ids, feats, labels, group, valid, w0, w1):
            scale = jnp.exp(clip_params["params"]["logit_scale"])

            def loss_fn(prefix):
                tf = coop_text_features(model, clip_params, prefix, token_ids)
                tf = tf.astype(jnp.float32)
                tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
                logits = scale * feats.astype(jnp.float32) @ tf.T
                return two_group_loss(logits, labels, group, valid, w0, w1), logits

            (loss, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(prefix)
            g = g + wd * prefix  # torch-SGD style weight decay
            mom_new = momentum * mom + g
            new_prefix = prefix - lr * mom_new
            correct = ((logits.argmax(1) == labels) * valid).sum()
            return new_prefix, mom_new, loss, correct

        return step

    def _apply_step(self, step, class_ctx, lr, feats, labels, group, valid):
        self.prefix, self._mom, loss, correct = step(
            self.runtime.params,
            self.prefix,
            self._mom,
            jnp.float32(lr),
            jnp.asarray(class_ctx),
            *put_batch(
                self.runtime.mesh,
                np.asarray(feats),
                np.asarray(labels),
                np.asarray(group),
                np.asarray(valid),
            ),
            jnp.float32(self._w0),
            jnp.float32(self._w1),
        )
        return float(loss), float(correct)

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
        self._mom = jnp.zeros_like(self.prefix)
