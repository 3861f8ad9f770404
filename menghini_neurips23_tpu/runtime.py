"""ClipRuntime: frozen CLIP + mesh + jitted batched tower passes.

The runtime owns everything the training strategies share: the frozen CLIP
parameters (replicated or TP-sharded over the mesh), the tokenizer, and
jit-compiled batched functions for the frozen-tower passes.  It replaces the
reference's `clip.load` + per-strategy `self.clip_model` usage.

All batched passes take uint8 images (normalization fuses into the first
matmul on device) and are sharded on the 'data' mesh axis.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from menghini_neurips23_tpu.config import Config
from menghini_neurips23_tpu.data.loader import iter_image_batches
from menghini_neurips23_tpu.models import CLIP, get_arch, init_clip_params, load_clip
from menghini_neurips23_tpu.parallel import (
    clip_param_sharding,
    data_parallelism,
    data_sharding,
    mesh_from_config,
)

log = logging.getLogger(__name__)


class ClipRuntime:
    """Frozen CLIP + mesh + jitted batched ops shared by all strategies."""

    def __init__(self, cfg: Config, mesh=None, tokenizer=None):
        self.cfg = cfg
        from menghini_neurips23_tpu.models.clip import set_fused_attention

        set_fused_attention(getattr(cfg, "FUSED_ATTENTION", "auto"))
        dtype = jnp.bfloat16 if cfg.COMPUTE_DTYPE == "bfloat16" else jnp.float32
        self.compute_dtype = dtype
        # the model module itself is built ONCE below, after the mesh's
        # data-parallel shard count is known (it is a module attribute)
        if cfg.CLIP_CKPT:
            arch, _, params = load_clip(cfg.CLIP_CKPT)
            self.params = params
            self.arch = arch
        else:
            arch = get_arch(cfg.VIS_ENCODER)
            self.arch = arch
            _, self.params = init_clip_params(arch, seed=0, dtype=dtype)
            if arch.name != "tiny-test":
                log.warning(
                    "No CLIP_CKPT given - using RANDOM %s weights (throughput "
                    "benchmarking only; supply a converted checkpoint for accuracy)",
                    arch.name,
                )
        # NOT for multimodal runs: the fused UPT step (both prompted towers +
        # mixer in one scan) sits on a measured v5e layout cliff - bf16-precast
        # weights alone cost it ~25% (91-106 s vs 74 s per 150-epoch run,
        # benchmarks/bisect_upt.py), while CoOp/VPT/encode are neutral-to-
        # faster.  Same cliff class as TEXT_TRUNCATE there (multimodal.py).
        # Compiled-HLO structure of both tips is recorded in
        # benchmarks/upt_cliff_fingerprint.json (fingerprint_upt_cliff.py;
        # pinned by tests/test_upt_cliff_fingerprint.py).
        precast = (
            dtype == jnp.bfloat16
            and getattr(cfg, "PRECAST_WEIGHTS", True)
            and getattr(cfg, "MODALITY", "text") != "multi"
        )
        if precast:
            from menghini_neurips23_tpu.models.clip import precast_matmul_params

            self.params = precast_matmul_params(self.params, dtype)
        self.mesh = mesh if mesh is not None else mesh_from_config(cfg)
        self.params = jax.device_put(
            self.params, clip_param_sharding(self.mesh, self.params)
        )
        if tokenizer is None:
            from menghini_neurips23_tpu.tokenizer import get_tokenizer

            tokenizer = get_tokenizer(cfg.BPE_PATH or None)
        self.tokenizer = tokenizer
        self._dp = data_parallelism(self.mesh)
        # auto attention dispatch sizes the score tensor PER DEVICE: rebuild
        # the model carrying THIS runtime's shard count (a module attribute,
        # so each runtime's jit traces see their own mesh - not whichever
        # runtime last touched a process global), and keep the global in sync
        # as the fallback for model functions built outside a runtime
        self.model = CLIP(self.arch, dtype=dtype, data_shards=self._dp)
        from menghini_neurips23_tpu.models.clip import set_attention_data_shards

        set_attention_data_shards(self._dp)
        self._dsh = data_sharding(self.mesh)
        # multi-controller: every host must read full results -> replicate
        # batched-pass outputs (an XLA all-gather over ICI/DCN); single host
        # keeps them data-sharded (all shards are addressable anyway)
        self._pc = jax.process_count()
        self._pi = jax.process_index()
        # the backend exists now: give the jax-free logging handler the
        # authoritative rank (see utils/logging.py module docstring)
        from menghini_neurips23_tpu.utils.logging import set_process_rank

        set_process_rank(self._pi)
        from menghini_neurips23_tpu.parallel import replicated

        self._osh = replicated(self.mesh) if self._pc > 1 else self._dsh
        if self._pc > 1:
            # warm each mesh axis's gloo sub-clique while ranks are aligned
            # (XLA caches communicators per clique; the full-mesh warmup at
            # group init does not cover dp-only/tp-only collectives)
            from menghini_neurips23_tpu.parallel.multihost import (
                warm_axis_collectives,
            )

            warm_axis_collectives(self.mesh)
        # decoded-uint8 LRU: GRIP's 10 refresh passes re-read the same pool
        # files; passes 2..N become RAM reads (data/loader.CachingImageLoader)
        from menghini_neurips23_tpu.utils.cache import BoundedFeatureCache

        self._decode_cache = (
            BoundedFeatureCache(cfg.DECODE_CACHE_BYTES)
            if getattr(cfg, "DECODE_CACHE_BYTES", 0) > 0
            else None
        )

    def _default_loader(self):
        """The uint8 pipeline, wrapped with the decode cache when enabled."""
        from menghini_neurips23_tpu.data.loader import CachingImageLoader, ImageLoader

        inner = ImageLoader(self.arch.image_resolution)
        if self._decode_cache is None:
            return inner
        return CachingImageLoader(inner, self._decode_cache)

    def put_rep(self, tree):
        """Host pytree -> jit-ready arrays (mesh-replicated when multi-host).

        One device_put per CALL, not per leaf: leaves copy in parallel, so
        batching a whole input bundle into a single put pays one dispatch
        roundtrip on high-latency device links instead of one per array."""
        if self._pc == 1:
            return jax.device_put(tree)
        from menghini_neurips23_tpu.parallel import replicate_tree

        return replicate_tree(self.mesh, tree)

    # ------------------------------------------------------------------ jitted
    def _folded_embed(self, params, images_u8):
        """vision_embed with the CLIP normalization folded into the patch
        matmul (ops/patch_embed.py): uint8 pixels feed the MXU directly."""
        from menghini_neurips23_tpu.ops.patch_embed import folded_patch_tokens

        p = params["params"]["visual"]
        kf, bias = self._folded_kernel
        x = folded_patch_tokens(
            images_u8, kf, bias, self.arch.vision_patch_size, self.compute_dtype
        )
        B = x.shape[0]
        cls = jnp.broadcast_to(
            p["class_embedding"].astype(self.compute_dtype),
            (B, 1, self.arch.vision_width),
        )
        x = jnp.concatenate([cls, x], axis=1)
        return x + p["positional_embedding"].astype(self.compute_dtype)

    @functools.cached_property
    def _folded_kernel(self):
        # plain numpy (NOT jnp): this property may be first evaluated inside a
        # jit trace, and caching a traced constant would leak the tracer
        from menghini_neurips23_tpu.ops.patch_embed import fold_normalization

        return fold_normalization(
            np.asarray(self.params["params"]["visual"]["conv1_kernel"])
        )

    def _float_embed(self, params, images_f32):
        """vision_embed from float images already preprocessed by a USER
        transform: raw conv1 matmul, no normalize folding (the transform's
        output feeds the tower directly - reference data/dataset.py:64-79)."""
        from menghini_neurips23_tpu.ops.patch_embed import patch_tokens

        p = params["params"]["visual"]
        x = patch_tokens(
            images_f32, p["conv1_kernel"], self.arch.vision_patch_size,
            self.compute_dtype,
        )
        B = x.shape[0]
        cls = jnp.broadcast_to(
            p["class_embedding"].astype(self.compute_dtype),
            (B, 1, self.arch.vision_width),
        )
        x = jnp.concatenate([cls, x], axis=1)
        return x + p["positional_embedding"].astype(self.compute_dtype)

    @functools.cached_property
    def _encode_images(self):
        def fn(params, images_u8):
            tokens = self._folded_embed(params, images_u8)
            return self.model.apply(params, tokens, method="vision_encode_tokens")

        return jax.jit(fn, out_shardings=self._osh)

    @functools.cached_property
    def _vision_embed(self):
        def fn(params, images_u8):
            return self._folded_embed(params, images_u8)

        return jax.jit(fn, out_shardings=self._osh)

    @functools.cached_property
    def _encode_images_float(self):
        def fn(params, images_f32):
            tokens = self._float_embed(params, images_f32)
            return self.model.apply(params, tokens, method="vision_encode_tokens")

        return jax.jit(fn, out_shardings=self._osh)

    @functools.cached_property
    def _vision_embed_float(self):
        def fn(params, images_f32):
            return self._float_embed(params, images_f32)

        return jax.jit(fn, out_shardings=self._osh)

    @functools.cached_property
    def _encode_text(self):
        def fn(params, ids):
            return self.model.apply(params, ids, method="encode_text")

        return jax.jit(fn, out_shardings=self._osh if self._pc > 1 else None)

    @property
    def logit_scale(self) -> float:
        return float(np.exp(self.params["params"]["logit_scale"]))

    # ------------------------------------------------------------- host-facing
    def encode_text(self, ids: np.ndarray, normalize: bool = True) -> np.ndarray:
        """(C, 77) ids -> (C, E) fp32 features."""
        feats = np.array(self._encode_text(self.params, np.asarray(ids)), np.float32)
        if normalize:
            feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def _batched_pass(
        self, fn, filepaths, batch_size: Optional[int] = None, cache=None, loader=None
    ):
        """Run a jitted per-batch image fn over a file list; returns stacked np.

        Multi-host: each process decodes ONLY its contiguous slice of every
        global batch (per-host IO sharding, replacing the reference's DDP
        sampler); the global batch is assembled by device placement and the
        replicated output gives every host the full result with exact
        unpadding (no drop_duplicates dedup, reference textual_prompt.py:294).

        :param loader: optional object with .load_all(files) -> (N,R,R,3)
            array and .out_dtype (e.g. TransformImageLoader for user
            transforms); default = the uint8 fast pipeline."""
        import concurrent.futures as cf
        import time

        bs = batch_size or max(self.cfg.BATCH_SIZE, 32)
        # global data-axis size is a multiple of the process count, so this
        # also makes the per-host slice (bs / pc) integral
        bs = int(np.ceil(bs / self._dp) * self._dp)
        outs = []
        t0 = time.perf_counter()
        if loader is None and cache is None and self._decode_cache is not None:
            loader = self._default_loader()
        if self._pc > 1:
            outs = self._batched_pass_multihost(fn, filepaths, bs, loader)
        elif loader is not None:
            R = self.arch.image_resolution
            steps = [filepaths[s : s + bs] for s in range(0, len(filepaths), bs)]

            def make(files):
                arr = loader.load_all(list(files))
                if arr.shape[0] < bs:
                    pad = np.zeros((bs - arr.shape[0], R, R, 3), loader.out_dtype)
                    arr = np.concatenate([arr, pad]) if arr.size else pad
                return arr, len(files)

            with cf.ThreadPoolExecutor(1) as prefetcher:  # decode behind compute
                fut = prefetcher.submit(make, steps[0]) if steps else None
                for i in range(len(steps)):
                    arr, count = fut.result()
                    fut = (
                        prefetcher.submit(make, steps[i + 1])
                        if i + 1 < len(steps)
                        else None
                    )
                    imgs = jax.device_put(arr, self._dsh)
                    out = np.asarray(fn(self.params, imgs), np.float32)
                    outs.append(out[:count])
        else:
            for batch in iter_image_batches(
                filepaths, bs, self.arch.image_resolution, cache=cache
            ):
                imgs = jax.device_put(batch.images, self._dsh)
                out = np.asarray(fn(self.params, imgs), np.float32)
                outs.append(out[: batch.count])
        n = len(filepaths)
        if n >= 512:  # observability for the big pool passes
            dt = time.perf_counter() - t0
            log.info("batched pass: %d images in %.2fs (%.0f img/s)", n, dt, n / dt)
        return np.concatenate(outs, axis=0) if outs else np.empty((0,))

    def _batched_pass_multihost(self, fn, filepaths, bs: int, loader=None):
        from menghini_neurips23_tpu.parallel import shard_filelist_for_batch

        if loader is None:
            loader = self._default_loader()
        lbs = bs // self._pc  # rows owned by this host per global batch
        R = self.arch.image_resolution
        outs = []
        for s in range(0, len(filepaths), bs):
            files = filepaths[s : s + bs]
            count = len(files)
            local_files = shard_filelist_for_batch(files, lbs, self._pi)
            local = loader.load_all(local_files)
            if local.shape[0] < lbs:  # zero-pad this host's slice
                pad = np.zeros((lbs - local.shape[0], R, R, 3), loader.out_dtype)
                local = np.concatenate([local, pad]) if local.size else pad
            imgs = jax.make_array_from_process_local_data(
                self._dsh, local, (bs, R, R, 3)
            )
            out = np.asarray(fn(self.params, imgs), np.float32)
            outs.append(out[:count])
        return outs

    def encode_images_from_files(
        self,
        filepaths: Sequence[str],
        normalize: bool = True,
        batch_size=None,
        cache=None,
        transform=None,
    ) -> np.ndarray:
        """Frozen image features for a file list: (N, E) fp32.

        :param transform: optional user transform (reference
            CustomDataset.transform) - honored via the per-item PIL path."""
        if transform is not None:
            from menghini_neurips23_tpu.data.loader import TransformImageLoader

            feats = self._batched_pass(
                self._encode_images_float, filepaths, batch_size,
                loader=TransformImageLoader(self.arch.image_resolution, transform),
            )
        else:
            feats = self._batched_pass(self._encode_images, filepaths, batch_size, cache)
        if normalize and len(feats):
            feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        return feats

    def vision_tokens_from_files(
        self, filepaths: Sequence[str], batch_size=None, cache=None, transform=None
    ) -> np.ndarray:
        """Pos-embedded CLS+patch tokens (N, 1+P, W) fp32 - the frozen,
        prompt-independent prefix of the vision tower, cached once for VPT/UPT
        training instead of recomputed every batch."""
        if transform is not None:
            from menghini_neurips23_tpu.data.loader import TransformImageLoader

            return self._batched_pass(
                self._vision_embed_float, filepaths, batch_size,
                loader=TransformImageLoader(self.arch.image_resolution, transform),
            )
        return self._batched_pass(self._vision_embed, filepaths, batch_size, cache)
