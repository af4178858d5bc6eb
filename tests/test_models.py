"""Model forward tests on tiny clouds (shape/structure regression).

Config mirrors cfgs/s3dis/AMContrast3D-AA.yaml scaled down (width 8, tiny N)
so CPU tests stay fast while exercising every block type.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.models import (MODELS, BaseSeg, BaseSeg_AMContrast3D,
                                     BaseSeg_M_AMContrast3D,
                                     build_model_from_cfg)

B, N, NCLS = 2, 512, 13

ENCODER_ARGS = dict(
    NAME="PointNextEncoder_AMContrast3D",
    blocks=[1, 2, 2, 2, 2],
    strides=[1, 4, 4, 4, 4],
    sa_layers=1,
    sa_use_res=False,
    width=8,
    in_channels=4,
    expansion=4,
    radius=0.3,
    nsample=8,
    aggr_args={"feature_type": "dp_fj", "reduction": "max"},
    group_args={"NAME": "ballquery", "normalize_dp": True},
    conv_args={"order": "conv-norm-act"},
    act_args={"act": "relu"},
    norm_args={"norm": "bn"},
)
CLS_ARGS = dict(NAME="SegHead", num_classes=NCLS, in_channels=None,
                norm_args={"norm": "bn"})
APM_ARGS = dict(NAME="APM_pf_ConCate", feature_dim=[8, 16, 32, 64],
                linear_mapping=False, cross_attention=False, feat_concate=False,
                channel=[16, 8, 4, 2, 2], dropout=[0, 0, 0, 0, 0],
                nsample_k=6, threshold=0.9, threshold_max=1.0, gamma=1,
                fusion="MIN", att_dim=3)


def _data(rng):
    pos = jnp.array(rng.rand(B, N, 3).astype(np.float32) * 2)
    feats = jnp.array(rng.rand(B, N, 4).astype(np.float32))
    return pos, feats


def test_base_seg_forward(rng):
    model = BaseSeg(encoder_args=ENCODER_ARGS, decoder_args={"NAME": "PointNextDecoder"},
                    cls_args=CLS_ARGS)
    pos, feats = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats, training=False)
    logits = model.apply(variables, pos, feats, training=False)
    assert logits.shape == (B, N, NCLS)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_channel_list():
    model = BaseSeg(encoder_args=ENCODER_ARGS, decoder_args={}, cls_args=CLS_ARGS)
    # width 8, strides [1,4,4,4,4] → [8, 16, 32, 64, 128]
    enc = MODELS.get("PointNextEncoder")(**{k: v for k, v in ENCODER_ARGS.items() if k != "NAME"})
    assert enc.channel_list == [8, 16, 32, 64, 128]


def test_aa_stage_shapes(rng):
    model = BaseSeg_AMContrast3D(encoder_args=ENCODER_ARGS,
                                 decoder_args={"NAME": "PointNextDecoder_AMContrast3D"},
                                 cls_args=CLS_ARGS)
    pos, feats = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats, training=False)
    logits, stages = model.apply(variables, pos, feats, training=False)
    assert logits.shape == (B, N, NCLS)
    ns = [N, N // 4, N // 16, N // 64]
    cs = [8, 16, 32, 64]
    for s in range(4):
        assert stages["p"][s].shape == (B, ns[s], 3)
        assert stages["f_down"][s].shape == (B, ns[s], cs[s])
        assert stages["f_up"][s].shape == (B, ns[s], cs[s])


def test_mm_forward_with_refinement(rng):
    model = BaseSeg_M_AMContrast3D(
        encoder_args=ENCODER_ARGS,
        decoder_args={"NAME": "PointNextDecoder_M_AMContrast3D"},
        cls_args=CLS_ARGS, APM_args=APM_ARGS, AEF_args={})
    pos, feats = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats, training=False)
    logits, stages, rate = model.apply(variables, pos, feats, training=False)
    assert logits.shape == (B, N, NCLS)
    assert len(stages["ambiguity"]) == 4
    for s, ns in enumerate([N, N // 4, N // 16, N // 64]):
        assert stages["ambiguity"][s].shape == (B, ns)
        a = np.asarray(stages["ambiguity"][s])
        assert np.all((a >= 0) & (a <= 1))
    assert 0.0 <= float(rate) <= 100.0


def test_train_mode_updates_batch_stats(rng):
    model = BaseSeg(encoder_args=ENCODER_ARGS, decoder_args={}, cls_args=CLS_ARGS)
    pos, feats = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats, training=False)
    logits, mutated = model.apply(
        variables, pos, feats, training=True,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    assert "batch_stats" in mutated
    # running stats moved away from init
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_build_from_registry():
    cfg = {"NAME": "BaseSeg_AMContrast3D", "encoder_args": ENCODER_ARGS,
           "decoder_args": {"NAME": "PointNextDecoder_AMContrast3D"},
           "cls_args": CLS_ARGS}
    model = build_model_from_cfg(cfg)
    assert isinstance(model, BaseSeg_AMContrast3D)


def test_apm_p_graph_closed_form(rng):
    """APM_p_Graph == literal GCNConv-on-star-graph + avg-pool (the upstream
    experimental path, separation.py:167-238)."""
    import jax.numpy as jnp
    from amcontrast3d_tpu.models.apm import APM_p_Graph
    from amcontrast3d_tpu.ops import group_points, knn

    B, N, k = 2, 64, 6
    p = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    m = APM_p_Graph(nsample_k=k)
    variables = m.init({"params": jax.random.PRNGKey(0)}, p)
    out = np.asarray(m.apply(variables, p))
    assert out.shape == (B, N, 1)

    W = np.asarray(variables["params"]["gcnconv"]["kernel"])  # (3, 1)
    b = np.asarray(variables["params"]["gcnconv"]["bias"])
    idx, _ = knn(p, p, k)
    rel = np.abs(np.asarray(group_points(p, idx[..., 1:]) - p[:, :, None, :]))
    pn = np.asarray(p)
    for bi in range(B):
        for i in range(0, N, 17):
            # star graph nodes: x0 = p_i, x_j = |p_i - p_nj|; GCN degrees
            # deg0 = 1 (self only), degj = 2 (self + 0->j)
            x0 = pn[bi, i] @ W  # norm 1/sqrt(1*1)
            xs = [0.5 * rel[bi, i, j] @ W + x0 / np.sqrt(2.0)
                  for j in range(k - 1)]
            nodes = [x0 + b] + [x + b for x in xs]
            want = np.mean(nodes, axis=0)
            np.testing.assert_allclose(out[bi, i], want, rtol=1e-5, atol=1e-6)


def test_eval_chunked_grouped_tail_exact(rng):
    """At inference the separable aggregation streams query chunks when the
    grouped tensor exceeds the budget (whole-room HBM guard); inference BN
    is a pure affine, so logits must be bitwise-stable vs the unchunked
    path up to float assoc (same math, same order within a chunk)."""
    import amcontrast3d_tpu.models.pointnext as PN
    model = BaseSeg_AMContrast3D(encoder_args=ENCODER_ARGS, decoder_args={},
                                 cls_args=CLS_ARGS)
    pos, feats = _data(rng)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, feats,
                           training=False)
    ref = model.apply(variables, pos, feats, training=False)[0]
    orig = PN._EVAL_GATHER_BUDGET
    try:
        PN._EVAL_GATHER_BUDGET = 4096  # force chunking at tiny shapes
        got = model.apply(variables, pos, feats, training=False)[0]
    finally:
        PN._EVAL_GATHER_BUDGET = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
