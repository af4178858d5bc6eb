"""ScanNet headline recipe path: model built from the unchanged reference
YAML (cfgs/scannet/AMContrast3D-AA.yaml — in_channels 7, 20 classes) and the
CrossEntropyAce objective under ignore_index=-100 (↔ reference
cfgs/scannet/default.yaml:47 and main_AA.py criterion wiring)."""
import jax
import jax.numpy as jnp
import numpy as np

from amcontrast3d_tpu.loss import CrossEntropyAce
from amcontrast3d_tpu.models import build_model_from_cfg
from amcontrast3d_tpu.utils import EasyConfig


def _load_scannet_cfg():
    cfg = EasyConfig()
    cfg.load("cfgs/scannet/AMContrast3D-AA.yaml", recursive=True)
    return cfg


def test_scannet_cfg_resolves():
    cfg = _load_scannet_cfg()
    assert cfg.num_classes == 20
    assert cfg.ignore_index == -100
    assert cfg.model.encoder_args.in_channels == 7
    assert cfg.dataset.train.voxel_max == 64000
    assert cfg.ambiguity_args.nu == 0.6
    assert cfg.ambiguity_args.temperature == 0.5


def test_scannet_model_forward_and_ace_loss(rng):
    """Full-width flagship model from the unchanged YAML, tiny N: forward
    logits are (B, N, 20) and CrossEntropyAce is finite with -100 labels
    present (ignored rows contribute nothing)."""
    cfg = _load_scannet_cfg()
    model = build_model_from_cfg(cfg.model)

    B, N = 1, 512
    pos = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 2)
    x = jnp.asarray(rng.rand(B, N, 7).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, x,
                           training=False)
    logits, stages = model.apply(variables, pos, x, training=False)
    assert logits.shape == (B, N, 20)
    assert np.isfinite(np.asarray(logits)).all()

    y = rng.randint(0, 20, (B, N)).astype(np.int32)
    mask = np.zeros((B, N), bool)
    mask[:, ::5] = True
    y[mask] = -100                        # ScanNet's ignored rows
    y = jnp.asarray(y)
    crit = CrossEntropyAce()
    aargs = dict(cfg.ambiguity_args)
    up = list(zip(stages["p"], stages["f_up"]))  # as engine/train.py:80-81
    loss = float(crit(logits, y, up, 20, cfg.ignore_index, aargs))
    assert np.isfinite(loss)

    # the objective's only logits dependence is the CE term, and -100 rows
    # are masked out of it: perturbing logits at ignored rows only must not
    # change the loss
    bump = jnp.where(jnp.asarray(mask)[..., None], 3.0, 0.0)
    loss2 = float(crit(logits + bump, y, up, 20, cfg.ignore_index,
                       aargs))
    np.testing.assert_allclose(loss, loss2, rtol=1e-6)
    # ...while perturbing a counted row does
    bump3 = jnp.zeros_like(logits).at[:, 1, :3].set(3.0)
    assert not mask[0, 1]
    loss3 = float(crit(logits + bump3, y, up, 20, cfg.ignore_index,
                       aargs))
    assert abs(loss3 - loss) > 1e-6
