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
            arch.transformer_width, arch.vision_width, cfg.TRANSFORMER_DIM,
            fp16_quirk=getattr(cfg, "UPT_FP16_QUIRK", False),
        )
        self.upt_params = init_upt_params(key, cfg, arch)
        self._init_opt_state()
        self._bump_prompt_version()

    def _get_prompt_tree(self):
        return self.upt_params

    def _set_prompt_tree(self, tree):
        self.upt_params = tree
        self._bump_prompt_version()

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
        # Deliberately NOT truncated (TEXT_TRUNCATE applies to the textual
        # modality only): the UPT text tower is just C rows so truncation
        # saves nothing, and on v5e the truncated-T fused UPT program lands on
        # a measured layout cliff - ~25% slower per 150-epoch run (105.9 s vs
        # 73.6 s, benchmarks/bisect_upt.py).  Exactness is unaffected either
        # way (causal attention; positions past EOT are dead).  Structurally:
        # T=16 under-fills the (8,128) tile's lane dim, the attention matmul
        # layouts flip minor dims, and the compiler adds +25% copies
        # (benchmarks/upt_cliff_fingerprint.json, fingerprint_upt_cliff.py).
        return self._memoized_token_ids(
            class_list,
            lambda: build_prompt_token_ids(
                self.runtime.tokenizer, class_list, self.config.TEXT_PREFIX_SIZE
            ),
        )

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
        # memoized on (prompt version, paths, class list): finish_workflow's
        # back-to-back test_predictions + evaluation over the same test set
        # (identical class lists in SSL/UL) run the prompted towers ONCE
        key = (getattr(self, "_prompt_version", 0), tuple(paths), tuple(class_list))
        memo = getattr(self, "_logits_memo", None)
        # an active user transform may be stochastic (the reference re-applies
        # self.transform per access) - never serve memoized logits then
        if memo is not None and memo[0] == key and self._active_transform is None:
            return memo[1]
        ids = np.asarray(self._train_text_class_ids(class_list))
        out = []
        for s in range(0, len(paths), batch):
            toks = self._features_for_paths(paths[s : s + batch], cache=False)
            tf, img = self._feats_fn(
                self.runtime.params, self.runtime.put_rep(self.upt_params),
                ids, np.asarray(toks, np.float32),
            )
            out.append(self.runtime.logit_scale * np.asarray(img) @ np.asarray(tf).T)
        logits = (
            np.concatenate(out) if out else np.empty((0, len(class_list)))
        )
        self._logits_memo = (key, logits)  # keep the latest only
        return logits

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
        def unbatch(p):
            # reference-produced artifacts carry the BATCHED (1, L, W)
            # embeddings UPTModel holds (it sizes itself via size()[1]/[2],
            # reference prompts_models.py:88-95); our mixer runs on (L, W)
            p = np.asarray(p)
            return p[0] if p.ndim == 3 and p.shape[0] == 1 else p

        self.upt_params = {
            "coop": jnp.asarray(unbatch(params[5])),
            "vpt": jnp.asarray(unbatch(params[7])),
            "mixer": jax.tree.map(jnp.asarray, mixer_params),
        }
        if params[6] is not None:
            self.upt_params["deep"] = jnp.asarray(params[6])
        self._init_opt_state()
        self._bump_prompt_version()
