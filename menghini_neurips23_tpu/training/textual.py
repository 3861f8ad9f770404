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
    truncate_context,
)
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
    def _encode_paths(self, paths: Sequence[str]) -> np.ndarray:
        return self.runtime.encode_images_from_files(
            paths, normalize=True, transform=self._active_transform
        )

    def _feature_item_nbytes(self) -> int:
        return self.runtime.arch.embed_dim * 4

    def _train_text_class_ids(self, class_list: Sequence[str]) -> np.ndarray:
        def build():
            ids = build_prompt_token_ids(
                self.runtime.tokenizer, class_list, self.config.PREFIX_SIZE
            )
            return truncate_context(ids) if self.config.TEXT_TRUNCATE else ids

        return self._memoized_token_ids(class_list, build)

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
            self._text_feats_fn(
                self.runtime.params, self.runtime.put_rep(self.prefix), np.asarray(ids)
            ),
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
        p = np.asarray(params[0])
        if p.ndim == 3 and p.shape[0] == 1:
            # reference-produced textual artifacts carry the batched
            # (1, L, W) prefix TextPrefixModel holds (clip_encoders.py:55-67)
            p = p[0]
        self.prefix = jnp.asarray(p)
        self._init_opt_state()
