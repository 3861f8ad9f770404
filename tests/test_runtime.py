"""ClipRuntime batched passes: correctness of batching/padding/sharding."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from menghini_neurips23_tpu.data.transforms import normalize_images


def test_encode_images_from_files_matches_direct(tmp_path, tiny_runtime, rng):
    a = tiny_runtime.arch
    paths = []
    imgs = []
    for i in range(11):  # odd count -> padding in the last batch
        arr = rng.integers(0, 255, (a.image_resolution, a.image_resolution, 3), dtype=np.uint8)
        p = tmp_path / f"i{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        imgs.append(arr)
    got = tiny_runtime.encode_images_from_files(paths, normalize=False)
    direct = np.asarray(
        tiny_runtime.model.apply(
            tiny_runtime.params,
            normalize_images(jnp.asarray(np.stack(imgs)), tiny_runtime.compute_dtype),
            method="encode_image",
        ),
        np.float32,
    )
    assert got.shape == direct.shape == (11, a.embed_dim)
    np.testing.assert_allclose(got, direct, rtol=2e-4, atol=2e-5)


def test_vision_tokens_from_files_shapes(tmp_path, tiny_runtime, rng):
    a = tiny_runtime.arch
    paths = []
    for i in range(3):
        arr = rng.integers(0, 255, (a.image_resolution, a.image_resolution, 3), dtype=np.uint8)
        p = tmp_path / f"t{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    toks = tiny_runtime.vision_tokens_from_files(paths)
    assert toks.shape == (3, a.num_patches + 1, a.vision_width)


def test_encode_text_normalized(tiny_runtime):
    ids = tiny_runtime.tokenizer.tokenize(["a photo of a cat", "a photo of a dog"])
    feats = tiny_runtime.encode_text(ids, normalize=True)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, rtol=1e-5)
