"""ASSA / ConvPool aggregation, dilated kNN, bf16 (AMP) path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.models.local_aggregation import ASSA, ConvPool
from amcontrast3d_tpu.ops.dilated_knn import dilated_knn
from amcontrast3d_tpu.ops import knn


def test_dilated_knn_strided(rng):
    p = jnp.array(rng.rand(1, 64, 3).astype(np.float32))
    idx_full, _ = knn(p, p, 8)
    idx_dil = dilated_knn(p, p, 4, dilation=2)
    np.testing.assert_array_equal(np.asarray(idx_dil),
                                  np.asarray(idx_full)[:, :, ::2])


def test_assa_forward(rng):
    p = jnp.array(rng.rand(2, 64, 3).astype(np.float32))
    f = jnp.array(rng.rand(2, 64, 8).astype(np.float32))
    mod = ASSA(channels=[8, 8, 24], num_preconv=1,
               group_args={"NAME": "ballquery", "radius": 0.3, "nsample": 8},
               norm_args={"norm": "bn"}, act_args={"act": "relu"})
    variables = mod.init({"params": jax.random.PRNGKey(0)}, p, p, f,
                         training=False)
    out = mod.apply(variables, p, p, f, training=False)
    assert out.shape == (2, 64, 24)
    assert np.all(np.isfinite(np.asarray(out)))


def test_convpool_forward(rng):
    p = jnp.array(rng.rand(2, 64, 3).astype(np.float32))
    f = jnp.array(rng.rand(2, 64, 8).astype(np.float32))
    mod = ConvPool(channels=[8, 16], feature_type="dp_fj",
                   group_args={"NAME": "ballquery", "radius": 0.3, "nsample": 8},
                   norm_args={"norm": "bn"}, act_args={"act": "relu"})
    variables = mod.init({"params": jax.random.PRNGKey(0)}, p, p, f,
                         training=False)
    out = mod.apply(variables, p, p, f, training=False)
    assert out.shape == (2, 64, 16)


def test_bf16_model_forward(rng):
    """use_amp path: bf16 compute dtype keeps outputs finite (BN in f32)."""
    from amcontrast3d_tpu.models import BaseSeg
    from test_models import CLS_ARGS, ENCODER_ARGS

    model = BaseSeg(encoder_args=ENCODER_ARGS, decoder_args={},
                    cls_args=CLS_ARGS, dtype=jnp.bfloat16)
    pos = jnp.array(rng.rand(1, 512, 3).astype(np.float32) * 2)
    feats = jnp.array(rng.rand(1, 512, 4).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats,
                           training=False)
    logits = model.apply(variables, pos, feats, training=False)
    assert np.all(np.isfinite(np.asarray(logits, dtype=np.float32)))
