"""Mesh/sharding logic on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from menghini_neurips23_tpu.models import TINY_TEST, init_clip_params
from menghini_neurips23_tpu.parallel import (
    clip_param_sharding,
    data_parallelism,
    make_mesh,
    pad_to_multiple,
    put_batch,
)


def test_make_mesh_default_1d():
    mesh = make_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.shape["data"] == 8


def test_make_mesh_2d():
    mesh = make_mesh((4, 2))
    assert mesh.axis_names == ("data", "model")
    assert data_parallelism(mesh) == 4


def test_pad_to_multiple():
    arr = np.arange(10).reshape(5, 2)
    padded, n = pad_to_multiple(arr, 4)
    assert padded.shape == (8, 2)
    assert n == 5
    assert (padded[5:] == 0).all()


def test_put_batch_shards_on_data_axis():
    mesh = make_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    y = jax.device_put(x, jax.sharding.NamedSharding(mesh, P("data")))
    got = put_batch(mesh, x)
    assert got.sharding.is_equivalent_to(y.sharding, ndim=2)
    np.testing.assert_array_equal(np.asarray(got), x)


def test_tp_param_sharding_specs():
    mesh = make_mesh((4, 2))
    _, params = init_clip_params(TINY_TEST, seed=0)
    shardings = clip_param_sharding(mesh, params)
    blk = shardings["params"]["visual"]["transformer"]["resblocks_0"]
    assert blk["c_fc"]["kernel"].spec == P(None, "model")
    assert blk["c_proj"]["kernel"].spec == P("model", None)
    assert blk["attn"]["in_proj_kernel"].spec == P(None, "model")
    assert blk["attn"]["out_proj"]["kernel"].spec == P("model", None)
    assert blk["ln_1"]["scale"].spec == P()
    # replicated elsewhere
    assert shardings["params"]["logit_scale"].spec == P()


def test_tp_sharded_forward_matches_replicated():
    """A TP-sharded CLIP forward must equal the replicated forward."""
    import jax.numpy as jnp

    mesh = make_mesh((4, 2))
    model, params = init_clip_params(TINY_TEST, seed=0)
    a = TINY_TEST
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, a.image_resolution, a.image_resolution, 3)).astype(np.float32)
    )
    ref = model.apply(params, images, method="encode_image")
    sharded_params = jax.device_put(params, clip_param_sharding(mesh, params))
    imgs_sharded = put_batch(mesh, np.asarray(images))
    got = jax.jit(lambda p, x: model.apply(p, x, method="encode_image"))(
        sharded_params, imgs_sharded
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    g.dryrun_multichip(2)


def test_graft_entry_single_chip_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_shard_filelist_for_batch():
    """The production per-host batch slicing (host-major fixed blocks)."""
    from menghini_neurips23_tpu.parallel import shard_filelist_for_batch

    files = [f"f{i}" for i in range(8)]
    # full batch, 4 hosts x 2 rows: exact cover in row-block order
    got = [shard_filelist_for_batch(files, 2, pi) for pi in range(4)]
    assert [f for s in got for f in s] == files
    assert all(len(s) == 2 for s in got)
    # short final batch (5 files): trailing hosts truncate / go empty
    short = files[:5]
    got = [shard_filelist_for_batch(short, 2, pi) for pi in range(4)]
    assert [f for s in got for f in s] == short
    assert [len(s) for s in got] == [2, 2, 1, 0]


def test_vit_l14_shapes_via_eval_shape():
    """ViT-L/14 wiring is validated shape-only (eval_shape, no FLOPs)."""
    import jax
    import jax.numpy as jnp

    from menghini_neurips23_tpu.models import VIT_L14
    from menghini_neurips23_tpu.models.clip import CLIP

    a = VIT_L14
    model = CLIP(a)
    images = jax.ShapeDtypeStruct((2, a.image_resolution, a.image_resolution, 3), jnp.float32)
    ids = jax.ShapeDtypeStruct((5, a.context_length), jnp.int32)
    params_shape = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros(images.shape), jnp.zeros(ids.shape, jnp.int32))
    )
    out = jax.eval_shape(
        lambda p, i, t: model.apply(p, i, t), params_shape, images, ids
    )
    assert out[0].shape == (2, 5)
    vt = params_shape["params"]["visual"]["transformer"]
    assert len(vt) == a.vision_layers
    assert vt["resblocks_0"]["attn"]["in_proj_kernel"].shape == (1024, 3072)
    assert params_shape["params"]["text"]["text_projection"].shape == (768, 768)


def test_split_json_generator(tmp_path):
    from menghini_neurips23_tpu.data.splits import generate_split_json

    d = tmp_path / "EuroSAT"
    d.mkdir()
    (d / "class_names.txt").write_text("\n".join(f"c{i}" for i in range(10)) + "\n")
    out = generate_split_json("EuroSAT", str(tmp_path), seeds=(500, 0))
    assert set(out) == {"split_500", "split_0"}
    assert len(out["split_500"]["seen"]) == 6
    assert set(out["split_500"]["seen"]) | set(out["split_500"]["unseen"]) == {f"c{i}" for i in range(10)}
