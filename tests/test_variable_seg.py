"""True variable-size (packed) segmentation path.

The packed reference layout maps to dense bucket-padded batches + per-cloud
valid counts (models/part_seg.py VariableSeg docstring).  The decisive
property is **bucket invariance**: a cloud's valid-point logits must not
depend on how much padding the bucket adds — which holds only if neighbor
queries, FPS and every BatchNorm are genuinely masked.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.models.part_seg import VariableSeg
from amcontrast3d_tpu.ops.masked import (dense_to_pack, fps_masked,
                                         pack_to_dense, valid_mask)

ENCODER_ARGS = dict(
    NAME="PointNextEncoder", blocks=[1, 1, 1], strides=[1, 4, 4],
    sa_layers=1, sa_use_res=False, width=8, in_channels=3, expansion=4,
    radius=0.12, nsample=8,
    aggr_args={"feature_type": "dp_fj", "reduction": "max"},
    group_args={"NAME": "ballquery", "normalize_dp": True},
    conv_args={"order": "conv-norm-act"},
    act_args={"act": "relu"}, norm_args={"norm": "bn"})
# dropout off: its random mask is shaped (B, Nmax, C), so the draw on valid
# rows would differ between buckets — orthogonal to what this file tests
CLS_ARGS = dict(NAME="VariableSegHead", num_classes=5, in_channels=None,
                dropout=0.0)


def _model():
    return VariableSeg(encoder_args=ENCODER_ARGS,
                       decoder_args={"NAME": "PointNextDecoder", "decoder_stages": 3},
                       cls_args=CLS_ARGS)


def _clouds(rng, sizes):
    return [(rng.rand(n, 3).astype(np.float32),
             rng.rand(n, 3).astype(np.float32)) for n in sizes]


def _batch(clouds, n_max):
    pos = np.concatenate([c[0] for c in clouds])
    x = np.concatenate([c[1] for c in clouds])
    offset = np.cumsum([len(c[0]) for c in clouds]).astype(np.int32)
    return pack_to_dense(pos, x, None, offset, n_max)


def test_pack_roundtrip(rng):
    clouds = _clouds(rng, [130, 200])
    d = _batch(clouds, 256)
    assert d["pos"].shape == (2, 256, 3)
    np.testing.assert_array_equal(d["n_valid"], [130, 200])
    packed, offset = dense_to_pack(d["pos"], d["n_valid"])
    np.testing.assert_array_equal(offset, [130, 330])
    np.testing.assert_allclose(packed[:130], clouds[0][0])
    np.testing.assert_allclose(packed[130:], clouds[1][0])


def test_fps_masked_prefix_consistent(rng):
    p = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    n_valid = jnp.asarray([50, 128], jnp.int32)
    idx = np.asarray(fps_masked(p, 32, n_valid))
    # every selected index is a valid point
    assert (idx[0] < 50).all() and (idx[1] < 128).all()
    # first 50//4 selections of cloud 0 equal FPS over the unpadded cloud
    from amcontrast3d_tpu.ops.fps import _furthest_point_sample_lax
    solo = np.asarray(_furthest_point_sample_lax(p[:1, :50], 12))
    np.testing.assert_array_equal(idx[0, :12], solo[0])


@pytest.mark.parametrize("training", [False, True])
def test_bucket_invariance(rng, training):
    """Same clouds, two bucket sizes → identical valid-point logits (and in
    train mode identical BatchNorm batch stats)."""
    clouds = _clouds(rng, [210, 260])
    small = _batch(clouds, 320)
    large = _batch(clouds, 512)
    model = _model()
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(small["pos"]), jnp.asarray(small["x"]),
        n_valid=jnp.asarray(small["n_valid"]), training=False)

    def run(batch):
        kwargs = dict(n_valid=jnp.asarray(batch["n_valid"]), training=training)
        if training:
            out, mut = model.apply(
                variables, jnp.asarray(batch["pos"]), jnp.asarray(batch["x"]),
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)}, **kwargs)
            return out, mut["batch_stats"]
        return model.apply(variables, jnp.asarray(batch["pos"]),
                           jnp.asarray(batch["x"]), **kwargs), None

    out_s, bs_s = run(small)
    out_l, bs_l = run(large)
    for i, n in enumerate([210, 260]):
        np.testing.assert_allclose(np.asarray(out_s)[i, :n],
                                   np.asarray(out_l)[i, :n],
                                   rtol=1e-4, atol=1e-4)
    if training:
        for a, b in zip(jax.tree_util.tree_leaves(bs_s),
                        jax.tree_util.tree_leaves(bs_l)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_cross_cloud_isolation(rng):
    """Cloud 0's logits don't change when cloud 1 is swapped out."""
    a, b, c = _clouds(rng, [200, 240, 180])
    model = _model()
    b1 = _batch([a, b], 256)
    b2 = _batch([a, c], 256)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(b1["pos"]), jnp.asarray(b1["x"]),
        n_valid=jnp.asarray(b1["n_valid"]), training=False)
    o1 = model.apply(variables, jnp.asarray(b1["pos"]), jnp.asarray(b1["x"]),
                     n_valid=jnp.asarray(b1["n_valid"]), training=False)
    o2 = model.apply(variables, jnp.asarray(b2["pos"]), jnp.asarray(b2["x"]),
                     n_valid=jnp.asarray(b2["n_valid"]), training=False)
    np.testing.assert_allclose(np.asarray(o1)[0, :200], np.asarray(o2)[0, :200],
                               rtol=1e-5, atol=1e-5)


def test_dense_path_unchanged(rng):
    """n_valid=None keeps the plain dense behavior (regression guard)."""
    clouds = _clouds(rng, [256, 256])
    batch = _batch(clouds, 256)
    model = _model()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(batch["pos"]), jnp.asarray(batch["x"]),
                           training=False)
    out = model.apply(variables, jnp.asarray(batch["pos"]),
                      jnp.asarray(batch["x"]), training=False)
    assert np.asarray(out).shape == (2, 256, 5)
