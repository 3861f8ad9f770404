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
        self._bump_prompt_version()

    def _get_prompt_tree(self):
        return self.prompt

    def _set_prompt_tree(self, tree):
        self.prompt = tree
        self._bump_prompt_version()

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
    def _encode_paths(self, paths: Sequence[str]) -> np.ndarray:
        return self.runtime.vision_tokens_from_files(
            paths, transform=self._active_transform
        )

    def _feature_item_nbytes(self) -> int:
        a = self.runtime.arch
        return (a.num_patches + 1) * a.vision_width * 4

    def _fused_feats_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.runtime.compute_dtype == jnp.bfloat16 else None

    def _train_text_class_ids(self, class_list: Sequence[str]) -> np.ndarray:
        """Frozen normalized text features for template prompts (reference
        visual_prompt.py:53-63 define_textual_prompts + encode_text)."""
        key = tuple(class_list)
        if key not in self._text_feat_cache:
            self._text_feat_cache[key] = self._zero_shot_text_features(class_list)
        return self._text_feat_cache[key]

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
        """Prompted, normalized image features for a file list.

        Memoized on (prompt version, path list): prompted image features are
        class-list-independent, so back-to-back evaluations over the same
        files (finish_workflow's test_predictions + evaluation, reference
        main_SSL.py:403+:418) run the prompted tower ONCE instead of twice."""
        key = (getattr(self, "_prompt_version", 0), tuple(paths))
        memo = getattr(self, "_img_feats_memo", None)
        # an active user transform may be stochastic (the reference re-applies
        # self.transform per access) - never serve memoized features then
        if memo is not None and memo[0] == key and self._active_transform is None:
            return memo[1]
        out = []
        for s in range(0, len(paths), batch):
            toks = self._features_for_paths(paths[s : s + batch], cache=False)
            out.append(
                np.asarray(
                    self._image_feats_fn(
                        self.runtime.params,
                        self.runtime.put_rep(self.prompt),
                        np.asarray(toks, np.float32),
                    ),
                    np.float32,
                )
            )
        feats = np.concatenate(out) if out else np.empty((0,))
        self._img_feats_memo = (key, feats)  # keep the latest only
        return feats

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
        p = np.asarray(params[0])
        if p.ndim == 3 and p.shape[0] == 1:
            # tolerate a reference-produced batched prefix
            # (CustomVisionTransformer expands either rank,
            # reference clip_encoders.py:148)
            p = p[0]
        self.prompt = {"prefix": jnp.asarray(p)}
        if len(params) > 1 and params[1] is not None:
            self.prompt["deep"] = jnp.asarray(params[1])
        self._init_opt_state()
        self._bump_prompt_version()
