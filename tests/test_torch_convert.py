"""Round-trip: torch reference .pth checkpoint → flax state via the
standalone key-mapping converter (utils/torch_convert.py).

The converter must reproduce EXACTLY the module-tree transplant
(tests/torch_ref.py) — which is itself forward-parity-tested against the
torch reference — from nothing but a saved state dict.  Covers:
  · the released-checkpoint envelope ({'model': …}, 'module.' DDP prefixes,
    sidecar epoch/best_val — openpoints/utils/ckpt_util.py:137-156)
  · BaseSeg, the AA flagship family and the MM (APM) family trees
  · the --pretrained_path model.pth end-to-end load (utils/ckpt.py) with
    forward-logits parity vs the live torch model
  · the tools/convert_torch_ckpt.py CLI output loading as a native .ckpt
"""
import subprocess
import sys

import numpy as np
import pytest

import torch_ref
from test_torch_parity import CLS, DEC, ENC, NCLS, _build_ref, _flat_paths, _inputs

pytestmark = pytest.mark.skipif(not torch_ref.available,
                                reason="reference checkout not available")


def _save_pth(model, path, envelope=True):
    import torch
    sd = model.state_dict()
    if envelope:  # released format: module.-prefixed under 'model'
        blob = {"model": {f"module.{k}": v for k, v in sd.items()},
                "epoch": 87, "best_val": 0.708}
    else:
        blob = sd
    torch.save(blob, path)


def _assert_tree_equal(converted, params, stats):
    got_p = _flat_paths(converted["params"])
    want_p = _flat_paths(params)
    assert set(got_p) == set(want_p), (
        f"only converted: {sorted(set(got_p) - set(want_p))[:6]}\n"
        f"only transplant: {sorted(set(want_p) - set(got_p))[:6]}")
    for k in want_p:
        np.testing.assert_array_equal(got_p[k], want_p[k], err_msg=str(k))
    got_s = _flat_paths(converted["batch_stats"])
    want_s = _flat_paths(stats)
    assert set(got_s) == set(want_s)
    for k in want_s:
        np.testing.assert_array_equal(got_s[k], want_s[k], err_msg=str(k))


def test_convert_matches_transplant_base_seg(tmp_path):
    from amcontrast3d_tpu.utils.torch_convert import convert_torch_checkpoint

    ref_model, torch = _build_ref("BaseSeg")
    path = str(tmp_path / "ref.pth")
    _save_pth(ref_model, path, envelope=True)
    converted, extras = convert_torch_checkpoint(path)
    assert extras["epoch"] == 87 and abs(extras["best_val"] - 0.708) < 1e-9
    params, stats = torch_ref.transplant_base_seg(ref_model)
    _assert_tree_equal(converted, params, stats)


def test_convert_matches_transplant_aa(tmp_path):
    from amcontrast3d_tpu.utils.torch_convert import convert_torch_checkpoint

    ref_model, torch = _build_ref(
        "BaseSeg_AMContrast3D",
        extra={"encoder_args": {**ENC,
                                "NAME": "PointNextEncoder_AMContrast3D"},
               "decoder_args": {**DEC,
                                "NAME": "PointNextDecoder_AMContrast3D"}})
    path = str(tmp_path / "aa.pth")
    _save_pth(ref_model, path, envelope=False)  # bare state dict form
    converted, _ = convert_torch_checkpoint(path)
    params, stats = torch_ref.transplant_base_seg(ref_model)
    _assert_tree_equal(converted, params, stats)


def test_convert_matches_transplant_mm(tmp_path):
    from amcontrast3d_tpu.utils.torch_convert import convert_torch_checkpoint

    apm_args = {"NAME": "APM_pf_ConCate", "feature_dim": [8, 16, 32, 64],
                "linear_mapping": True, "cross_attention": False,
                "feat_concate": True, "channel": [32, 16, 8, 4, 2],
                "dropout": [0, 0, 0, 0, 0], "nsample_k": 6,
                "threshold": 0.7, "threshold_max": 1.0, "gamma": 0.5,
                "fusion": "MIN"}
    aef_args = {"source": "APM", "source_mode": "Test", "nsample": 8,
                "ccbeta": 0.04, "cctype": "Method2", "temperature": 0.3,
                "supervisedCL": "Method1", "db": "-m", "margin": "adaptive",
                "mu": -1, "nu": 0.5, "w1": 0.1, "w2": 0.9, "w3": 0.01,
                "stages": "up", "stages_num": 2}
    ref_model, torch = _build_ref(
        "BaseSeg_M_AMContrast3D",
        extra={"encoder_args": {**ENC,
                                "NAME": "PointNextEncoder_M_AMContrast3D"},
               "decoder_args": {**DEC,
                                "NAME": "PointNextDecoder_M_AMContrast3D"},
               "cls_args": {**CLS, "ignore_index": None},
               "APM_args": apm_args, "AEF_args": aef_args})
    path = str(tmp_path / "mm.pth")
    _save_pth(ref_model, path, envelope=True)
    converted, _ = convert_torch_checkpoint(path)
    params, stats = torch_ref.transplant_mm(ref_model, n_stages=2)
    # the reference APM hard-codes 4 towers (concatenation.py:29-175) but
    # only stages_num of them are live; the converter maps all saved towers
    # and the tolerant loader drops the unused ones.  Compare on the live
    # subset, and check the surplus is exactly the dead towers/maps.
    got_p = _flat_paths(converted["params"])
    want_p = _flat_paths(params)
    surplus = {k for k in set(got_p) - set(want_p)}
    assert surplus and all(
        k[0] == "APM" and k[1].split("_")[-1] in ("2", "3") for k in surplus
    ), f"unexpected surplus beyond dead APM towers: {sorted(surplus)[:6]}"
    # also: transplant was built with linear_mapping=True so map_{0,1} are
    # in BOTH trees — the maps themselves round-trip
    assert ("APM", "map_0", "kernel") in want_p
    for k in want_p:
        np.testing.assert_array_equal(got_p[k], want_p[k], err_msg=str(k))
    got_s = _flat_paths(converted["batch_stats"])
    want_s = _flat_paths(stats)
    for k in want_s:
        np.testing.assert_array_equal(got_s[k], want_s[k], err_msg=str(k))


def test_pretrained_path_pth_end_to_end(tmp_path):
    """utils/ckpt.load_checkpoint accepts a .pth directly: template init →
    tolerant merge of the converted tree → forward logits equal torch's."""
    import jax
    import jax.numpy as jnp

    from amcontrast3d_tpu.models import build_model_from_cfg
    from amcontrast3d_tpu.utils.ckpt import load_checkpoint

    ref_model, torch = _build_ref("BaseSeg")
    path = str(tmp_path / "released.pth")
    _save_pth(ref_model, path, envelope=True)

    ours = build_model_from_cfg(
        {"NAME": "BaseSeg", "encoder_args": dict(ENC),
         "decoder_args": dict(DEC), "cls_args": dict(CLS)})
    pos, feat = _inputs(11)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(pos),
                          jnp.asarray(feat), training=False)
    state, epoch, extras = load_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, path)
    assert epoch == 87

    with torch.no_grad():
        ref_logits = ref_model({"pos": torch.tensor(pos),
                                "x": torch.tensor(feat.transpose(0, 2, 1))})
    ref_logits = ref_logits.numpy().transpose(0, 2, 1)
    out = ours.apply({"params": state["params"],
                      "batch_stats": state["batch_stats"]},
                     jnp.asarray(pos), jnp.asarray(feat), training=False)
    err = np.abs(np.asarray(out) - ref_logits).max()
    assert err < 1e-4, f"converted-ckpt logits diverge: {err}"


def test_convert_cli_writes_native_ckpt(tmp_path):
    """tools/convert_torch_ckpt.py produces a .ckpt the native loader reads
    byte-identically to the on-the-fly conversion."""
    import jax
    import jax.numpy as jnp

    from amcontrast3d_tpu.models import build_model_from_cfg
    from amcontrast3d_tpu.utils.ckpt import load_checkpoint

    ref_model, torch = _build_ref("BaseSeg")
    src = str(tmp_path / "in.pth")
    dst = str(tmp_path / "out.ckpt")
    _save_pth(ref_model, src, envelope=True)
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/convert_torch_ckpt.py"),
         src, dst],
        capture_output=True, text=True, cwd=repo,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": os.path.expanduser("~")})
    assert r.returncode == 0, r.stderr[-2000:]

    ours = build_model_from_cfg(
        {"NAME": "BaseSeg", "encoder_args": dict(ENC),
         "decoder_args": dict(DEC), "cls_args": dict(CLS)})
    pos, feat = _inputs(12)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(pos),
                          jnp.asarray(feat), training=False)
    template = {"params": variables["params"],
                "batch_stats": variables["batch_stats"]}
    from_pth, e1, _ = load_checkpoint(template, src)
    from_ckpt, e2, _ = load_checkpoint(template, dst)
    assert e1 == e2 == 87
    a = _flat_paths(from_pth["params"])
    b = _flat_paths(from_ckpt["params"])
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=str(k))
