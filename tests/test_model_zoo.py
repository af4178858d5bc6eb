"""Forward tests for the non-PointNeXt model families (parity items of
SURVEY.md §2.3): PointNet, PointNet++, PointViT, part-seg wrappers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.models import MODELS

B, N = 2, 256


def _data(rng, c=4):
    pos = jnp.array(rng.rand(B, N, 3).astype(np.float32) * 2)
    feats = jnp.array(rng.rand(B, N, c).astype(np.float32))
    return pos, feats


def test_pointnet_encoder(rng):
    cls = MODELS.get("PointNetEncoder")
    model = cls(in_channels=3, is_seg=True)
    pos, _ = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, pos,
                           training=False)
    _, f = model.apply(variables, pos, pos, training=False)
    assert f.shape == (B, N, 64 + 1024)
    # identity-initialized STN: forward finite
    assert np.all(np.isfinite(np.asarray(f)))


def test_pointnet2_encoder_decoder(rng):
    enc_cls = MODELS.get("PointNet2Encoder")
    enc = enc_cls(in_channels=4, radius=0.2, num_samples=8, width=8,
                  strides=[2, 2], layers=2,
                  aggr_args={"feature_type": "dp_fj"},
                  group_args={"NAME": "ballquery"}, conv_args={},
                  norm_args={"norm": "bn"}, act_args={"act": "relu"})
    pos, feats = _data(rng)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, pos, feats,
                         training=False)
    p, f = enc.apply(variables, pos, feats, training=False)
    assert len(p) == 3
    assert p[1].shape == (B, N // 2, 3)
    assert f[2].shape[-1] == enc.channel_list[-1]

    dec_cls = MODELS.get("PointNet2Decoder")
    dec = dec_cls(encoder_channel_list=enc.channel_list, in_channels_input=4)
    dvars = dec.init({"params": jax.random.PRNGKey(1)}, p, f, training=False)
    f_out, _, _ = dec.apply(dvars, p, f, training=False)
    assert f_out.shape[:2] == (B, N)


def test_pointvit_seg(rng):
    cls = MODELS.get("PointVitSeg")
    model = cls(in_channels=4, num_classes=13, encoder_dim=32, depth=2,
                num_heads=2, num_points=[64, 32],
                embed_args={"num_groups": 16, "group_size": 8,
                            "embed_dim": 32},
                fp_mlps=[[32, 32], [32, 32], [32, 32]])
    pos, feats = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats,
                           training=False)
    logits = model.apply(variables, pos, feats, training=False)
    assert logits.shape == (B, N, 13)


def test_base_part_seg(rng):
    cls = MODELS.get("BasePartSeg")
    enc_args = dict(NAME="PointNextEncoder", blocks=[1, 1, 1],
                    strides=[1, 2, 2], width=8, in_channels=4, sa_layers=1,
                    radius=0.3, nsample=8,
                    aggr_args={"feature_type": "dp_fj", "reduction": "max"},
                    group_args={"NAME": "ballquery"},
                    norm_args={"norm": "bn"}, act_args={"act": "relu"})
    model = cls(encoder_args=enc_args,
                decoder_args={"decoder_blocks": [1, 1],
                              "decoder_strides": [2, 2],
                              "num_classes": 16},
                cls_args={"NAME": "SegHead", "num_classes": 50})
    pos, feats = _data(rng)
    cls_label = jnp.zeros((B, 1), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats,
                           cls_label, training=False)
    logits = model.apply(variables, pos, feats, cls_label, training=False)
    assert logits.shape == (B, N, 50)


def test_multi_seg_head(rng):
    cls = MODELS.get("MultiSegHead")
    head = cls(num_classes=50, in_channels=16)
    f = jnp.array(rng.rand(B, N, 16).astype(np.float32))
    variables = head.init({"params": jax.random.PRNGKey(0)}, f, training=False)
    outs = head.apply(variables, f, training=False)
    assert len(outs) == 16
    assert outs[0].shape == (B, N, 4)


def test_variable_seg(rng):
    cls = MODELS.get("VariableSeg")
    enc_args = dict(NAME="PointNextEncoder", blocks=[1, 1, 1],
                    strides=[1, 2, 2], width=8, in_channels=4, sa_layers=1,
                    radius=0.3, nsample=8,
                    aggr_args={"feature_type": "dp_fj", "reduction": "max"},
                    group_args={"NAME": "ballquery"},
                    norm_args={"norm": "bn"}, act_args={"act": "relu"})
    model = cls(encoder_args=enc_args,
                decoder_args={"decoder_stages": 2},
                cls_args={"num_classes": 13})
    pos, feats = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats,
                           training=False)
    logits = model.apply(variables, pos, feats, training=False)
    assert logits.shape == (B, N, 13)


def test_base_seg_with_pointnet2(rng):
    """BaseSeg dispatches decoder by NAME (PointNet2Decoder)."""
    from amcontrast3d_tpu.models import BaseSeg
    enc_args = dict(NAME="PointNet2Encoder", in_channels=4, width=8,
                    strides=[2, 2], layers=2, radius=0.2, num_samples=8,
                    aggr_args={"feature_type": "dp_fj"},
                    group_args={"NAME": "ballquery"},
                    norm_args={"norm": "bn"}, act_args={"act": "relu"})
    model = BaseSeg(encoder_args=enc_args,
                    decoder_args={"NAME": "PointNet2Decoder"},
                    cls_args={"NAME": "SegHead", "num_classes": 13})
    pos, feats = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats,
                           training=False)
    logits = model.apply(variables, pos, feats, training=False)
    assert logits.shape == (B, N, 13)


def test_pointnet2_part_decoder(rng):
    """PointNet2PartDecoder: FP stack + 16-way one-hot at the finest stage
    (↔ pointnetv2.py:384-511)."""
    enc_cls = MODELS.get("PointNet2Encoder")
    enc = enc_cls(in_channels=4, radius=0.2, num_samples=8, width=8,
                  strides=[2, 2], layers=2,
                  aggr_args={"feature_type": "dp_fj"},
                  group_args={"NAME": "ballquery"}, conv_args={},
                  norm_args={"norm": "bn"}, act_args={"act": "relu"})
    pos, feats = _data(rng)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, pos, feats,
                         training=False)
    p, f = enc.apply(variables, pos, feats, training=False)

    dec_cls = MODELS.get("PointNet2PartDecoder")
    dec = dec_cls(encoder_channel_list=enc.channel_list,
                  in_channels_input=4, num_classes=16)
    cls_label = jnp.zeros((B, 1), jnp.int32)
    dvars = dec.init({"params": jax.random.PRNGKey(1)}, p, f, cls_label,
                     training=False)
    out = dec.apply(dvars, p, f, cls_label, training=False)
    assert out.shape[:2] == (B, N)
    assert out.shape[-1] == dec.out_channels
    assert np.all(np.isfinite(np.asarray(out)))
    # the class one-hot must influence the output
    out2 = dec.apply(dvars, p, f, jnp.full((B, 1), 5, jnp.int32),
                     training=False)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


@pytest.mark.parametrize("ft", ["dp_fj", "dp_df"])
def test_point_patch_embed(rng, ft):
    """PointPatchEmbed (↔ group_embed.py:59-180): ratio-FPS tokens."""
    cls = MODELS.get("PointPatchEmbed")
    model = cls(sample_ratio=0.25, group_size=8, in_channels=4, layers=4,
                embed_dim=32, radius=0.3, feature_type=ft,
                norm_args={"norm": "bn"}, act_args={"act": "relu"})
    pos, feats = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats,
                           training=False)
    (p_lvls, f_lvls) = model.apply(variables, pos, feats, training=False)
    assert p_lvls[0].shape == (B, N, 3)
    assert p_lvls[1].shape == (B, N // 4, 3)
    assert f_lvls[1].shape == (B, N // 4, 32)
    assert np.all(np.isfinite(np.asarray(f_lvls[1])))


def test_p3embed(rng):
    """P3Embed (↔ group_embed.py:183-286): progressive pyramid, width
    doubling per stage."""
    cls = MODELS.get("P3Embed")
    model = cls(sample_ratio=0.0625, scale=4, group_size=8, in_channels=4,
                layers=4, embed_dim=64, radius=0.3, feature_type="dp_df",
                norm_args={"norm": "bn"}, act_args={"act": "relu"})
    assert model.stages == 2
    pos, feats = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats,
                           training=False)
    out_p, out_f = model.apply(variables, pos, feats, training=False)
    assert len(out_p) == 3 and len(out_f) == 3
    assert out_p[1].shape == (B, N // 4, 3)
    assert out_p[2].shape == (B, N // 16, 3)
    assert out_f[1].shape == (B, N // 4, 32)   # embed_dim // 2^(stages-1)
    assert out_f[2].shape == (B, N // 16, 64)
    assert np.all(np.isfinite(np.asarray(out_f[2])))


def test_subsample_group_random(rng):
    """SubsampleGroup random-subsample path draws from the sample rng."""
    from amcontrast3d_tpu.models.group_embed import SubsampleGroup
    model = SubsampleGroup(num_groups=16, group_size=8, subsample="random",
                           radius=0.3)
    pos, feats = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "sample": jax.random.PRNGKey(1)},
                           pos, feats)
    gp, cp, fj, cx = model.apply(variables, pos, feats,
                                 rngs={"sample": jax.random.PRNGKey(2)})
    assert cp.shape == (B, 16, 3)
    assert fj.shape == (B, 16, 8, 4)
    # deterministic fallback without the rng stream
    gp2, cp2 = model.apply(variables, pos)
    assert cp2.shape == (B, 16, 3)
