"""End-to-end eval-seam parity: a reference-format ``.pth`` through this
repo's ``--mode=test`` voting eval vs the live torch reference's
``test_boundary_inner`` on the same fixture rooms.

This is the exact composition that executes on day one with real data —
converter → whole-scene voxel-rank subclouds → scatter-mean voting →
confusion matrices (whole + boundary/inner split) → CSV — and each piece is
individually parity-tested elsewhere; this test exercises them as a whole
(VERDICT r4 top item).  Match: ``main_AA.py:516-802`` (test_boundary_inner),
``utils/ckpt_util.py:137-183`` (tolerant .pth load).

Fixture rooms are constructed so that every voxel-rank subcloud has exactly
``n_voxels`` points and ``eval_bucket == n_voxels`` (zero padding): the torch
reference sizes its FPS stages from the true subcloud length, so bucket
padding would change the sampling schedule — with zero padding both stacks
run identical shapes and the comparison is per-point.
"""
import os
import sys
import types

import numpy as np
import pytest
import yaml

import torch_ref

pytestmark = pytest.mark.skipif(not torch_ref.available,
                                reason="reference checkout not available")

NCLS = 13
NVOX = 1024      # voxels per room == subcloud size == eval bucket
VOXEL = 0.04
CLASSES = ["ceiling", "floor", "wall", "beam", "column", "window", "door",
           "chair", "table", "bookcase", "sofa", "board", "clutter"]

ENC = dict(in_channels=4, width=8, blocks=[1, 2, 2], strides=[1, 2, 2],
           sa_layers=1, nsample=8, radius=0.1, expansion=4,
           aggr_args={"feature_type": "dp_fj", "reduction": "max"},
           conv_args={"order": "conv-norm-act"},
           group_args={"NAME": "ballquery", "normalize_dp": False},
           norm_args={"norm": "bn"}, act_args={"act": "relu"})
DEC = dict(decoder_stages=2)
CLS = dict(NAME="SegHead", num_classes=NCLS, in_channels=None,
           norm_args={"norm": "bn"})
AARGS = {"action": False, "vis": False, "nsample": 8, "ccbeta": 0.04,
         "cctype": "Method2", "temperature": 0.3, "supervisedCL": "Method1",
         "db": "-m", "margin": "adaptive", "mu": -1, "nu": 0.5,
         "miou_B_I": True, "w1": 0.1, "w2": 0.9, "w3": 0.01,
         "stages": "up", "stages_num": 2, "source": "APM",
         "source_mode": "Train"}


def _make_exact_room(rng, n_voxels=NVOX, n_extra=280):
    """Room whose voxel grid is exact: one anchor point at (0,0,0) pins
    ``coord.min(0) == 0`` so the eval pipeline's min-shift is a no-op and
    the voxel partition equals the construction partition.  ``n_extra``
    cells get a second point → count.max()==2 → two voxel-rank subclouds
    of exactly ``n_voxels`` points each."""
    grid = np.stack(np.meshgrid(np.arange(12), np.arange(12), np.arange(8),
                                indexing="ij"), -1).reshape(-1, 3)
    assert (grid == 0).all(1).any()
    # force cell (0,0,0) first, then sample the rest
    others = grid[~(grid == 0).all(1)]
    cells = np.concatenate([[[0, 0, 0]],
                            others[rng.choice(len(others), n_voxels - 1,
                                              replace=False)]])

    def jitter(cells_):
        return (cells_ * VOXEL +
                rng.uniform(0.004, 0.036, (len(cells_), 3))).astype(np.float32)

    base = jitter(cells)
    base[0] = 0.0  # the exact-min anchor point
    extra = jitter(cells[rng.choice(n_voxels, n_extra, replace=False)])
    pos = np.concatenate([base, extra])

    # spatial-blob labels (coherent neighborhoods → real boundary points)
    anchors = rng.uniform(pos.min(0), pos.max(0), (NCLS, 3)).astype(np.float32)
    label = np.argmin(((pos[:, None, :] - anchors[None]) ** 2).sum(-1), -1)
    palette = rng.uniform(40, 215, (NCLS, 3)).astype(np.float32)
    color = np.clip(palette[label] + rng.randn(len(pos), 3) * 12, 0, 255)
    return pos, color.astype(np.float32), label.astype(np.float32)


@pytest.fixture(scope="module")
def s3dis_root(tmp_path_factory):
    rng = np.random.RandomState(7)
    root = tmp_path_factory.mktemp("seam") / "s3disfull"
    raw = root / "raw"
    raw.mkdir(parents=True)
    for name in ["Area_5_office_1", "Area_5_office_2"]:
        pos, color, label = _make_exact_room(rng)
        np.save(raw / f"{name}.npy",
                np.hstack([pos, color, label[:, None]]))
    return str(root)


def _scatter_stub(capture):
    import torch

    def scatter(src, index, dim=0, reduce="mean"):
        assert dim == 0 and reduce == "mean"
        n = int(index.max()) + 1
        out = torch.zeros((n,) + tuple(src.shape[1:]), dtype=src.dtype)
        cnt = torch.zeros(n, dtype=src.dtype)
        out.index_add_(0, index, src)
        cnt.index_add_(0, index, torch.ones(len(index), dtype=src.dtype))
        out = out / cnt.clamp(min=1).unsqueeze(-1)
        capture.append(out.detach().clone())
        return out

    return scatter


def _load_main_aa(capture):
    """Import the reference trainer module with its missing deps stubbed
    (wandb, torch_scatter) and the CUDA extensions already redirected by
    torch_ref.load_reference()."""
    torch_ref.load_reference()
    if "wandb" not in sys.modules:
        w = types.ModuleType("wandb")
        w.run = None
        sys.modules["wandb"] = w
    ts = types.ModuleType("torch_scatter")
    ts.scatter = _scatter_stub(capture)
    sys.modules["torch_scatter"] = ts
    np.int = int  # removed numpy alias the reference still uses
    seg_dir = os.path.join(torch_ref.REF, "examples", "segmentation")
    if seg_dir not in sys.path:
        sys.path.insert(0, seg_dir)
    import importlib
    if "main_AA" in sys.modules:
        main_aa = sys.modules["main_AA"]
        main_aa.scatter = ts.scatter  # rebind the capture
        return main_aa
    return importlib.import_module("main_AA")


def _ref_cfg_tree(d):
    ref = torch_ref.load_reference()
    c = ref["RefConfig"]()
    for k, v in d.items():
        c[k] = _ref_cfg_tree(v) if isinstance(v, dict) else v
    return c


def _build_torch_model():
    import torch
    torch_ref.load_reference()
    from openpoints.models.build import build_model_from_cfg
    cfg = _ref_cfg_tree({
        "NAME": "BaseSeg_AMContrast3D",
        "encoder_args": {**ENC, "NAME": "PointNextEncoder_AMContrast3D"},
        "decoder_args": {**DEC, "NAME": "PointNextDecoder_AMContrast3D"},
        "cls_args": dict(CLS)})
    torch.manual_seed(42)
    model = build_model_from_cfg(cfg)
    model.eval()
    return model, torch


def _torch_test_cfg(s3dis_root, tmp_path):
    return _ref_cfg_tree({
        "num_classes": NCLS, "ignore_index": None, "classes": CLASSES,
        "task_name": "s3dis", "cfg_basename": "seamtest",
        "run_dir": str(tmp_path / "torch_run"),
        "save_path": str(tmp_path / "torch_run" / "pred"),
        "visualize": False, "distributed": False,
        "feature_keys": "x,heights",
        "dataset": {"common": {"NAME": "S3DIS", "data_root": s3dis_root,
                               "test_area": 5, "voxel_size": VOXEL},
                    "test": {"split": "test"}},
        "datatransforms": {"val": ["PointsToTensor", "PointCloudXYZAlign",
                                   "ChromaticNormalize"],
                           "kwargs": {"gravity_dim": 2}},
        "ambiguity_args": dict(AARGS)})


def _our_yaml(s3dis_root, tmp_path):
    cfg = {
        "dataset": {
            "common": {"NAME": "S3DIS", "data_root": s3dis_root,
                       "test_area": 5, "voxel_size": VOXEL},
            "train": {"split": "train", "voxel_max": 256, "loop": 1},
            "val": {"split": "val", "voxel_max": None},
            "test": {"split": "test", "voxel_max": None},
        },
        "feature_keys": "x,heights",
        "classes": CLASSES,
        "num_classes": NCLS,
        "batch_size": 1,
        "val_batch_size": 1,
        "eval_bucket": NVOX,
        "epochs": 1,
        "seed": 0,
        "sched": "cosine", "lr": 0.01, "min_lr": 1.0e-5,
        "optimizer": {"NAME": "adamw", "weight_decay": 1.0e-4},
        "grad_norm_clip": 10,
        "root_dir": str(tmp_path / "log"),
        "log_dir": "seam",
        "datatransforms": {
            "train": ["PointsToTensor", "PointCloudXYZAlign",
                      "ChromaticNormalize"],
            "val": ["PointsToTensor", "PointCloudXYZAlign",
                    "ChromaticNormalize"],
            "kwargs": {"gravity_dim": 2},
        },
        "ambiguity_args": dict(AARGS),
        "model": {
            "NAME": "BaseSeg_AMContrast3D",
            "encoder_args": {**ENC, "NAME": "PointNextEncoder_AMContrast3D"},
            "decoder_args": {**DEC, "NAME": "PointNextDecoder_AMContrast3D"},
            "cls_args": dict(CLS),
        },
        "distributed": False,
    }
    path = tmp_path / "seam.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def _fit_briefly(model, s3dis_root, steps=30):
    """A few CE steps on room 1 so the checkpoint is a DIVERSE predictor
    (a random-weight PointNeXt collapses to one constant class, which would
    make the per-point comparison vacuous).  Uses the reference's own
    forward/backward on CPU (fake-extension grad wrappers, torch_ref.py)."""
    import torch as th
    from openpoints.dataset import get_features_by_keys
    from openpoints.transforms import build_transforms_from_cfg

    arr = np.load(os.path.join(s3dis_root, "raw", "Area_5_office_1.npy"))
    pos, color, label = arr[:, :3].astype(np.float32), arr[:, 3:6], arr[:, 6]
    feat = np.clip(color / 255.0, 0, 1).astype(np.float32)
    pipe = build_transforms_from_cfg("val", _ref_cfg_tree(
        {"val": ["PointsToTensor", "PointCloudXYZAlign",
                 "ChromaticNormalize"], "kwargs": {"gravity_dim": 2}}))
    data = pipe({"pos": pos.copy(), "x": feat.copy()})
    data["heights"] = th.from_numpy(pos[:, 2:3]).unsqueeze(0)
    data["pos"] = data["pos"].unsqueeze(0)
    data["x"] = data["x"].unsqueeze(0)
    data["x"] = get_features_by_keys(data, "x,heights")
    y = th.from_numpy(label.astype(np.int64)).unsqueeze(0)
    model.train()
    opt = th.optim.Adam(model.parameters(), lr=0.01)
    for _ in range(steps):
        logits, _ = model(data)
        loss = th.nn.functional.cross_entropy(logits, y)
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()
    with th.no_grad():
        logits, _ = model(data)
    pred = logits.argmax(1).numpy().ravel()
    assert len(np.unique(pred)) >= 5, "fixture fit failed to diversify"


def test_mode_test_parity_vs_torch_reference(s3dis_root, tmp_path):
    import torch

    # ---- torch reference: briefly-fitted released-format .pth + its own
    # test_boundary_inner over the fixture rooms --------------------------
    ref_model, _ = _build_torch_model()
    _fit_briefly(ref_model, s3dis_root)
    pth = str(tmp_path / "released.pth")
    sd = ref_model.state_dict()
    torch.save({"model": {f"module.{k}": v for k, v in sd.items()},
                "epoch": 87, "best_val": 0.7}, pth)

    captured = []
    main_aa = _load_main_aa(captured)
    tcfg = _torch_test_cfg(s3dis_root, tmp_path)
    os.makedirs(tcfg.run_dir, exist_ok=True)
    data_list = main_aa.generate_data_list(tcfg)
    assert len(data_list) == 2
    with torch.no_grad():
        (t_miou, t_macc, t_oa, t_ious, _accs,
         t_miou_b, t_macc_b, t_oa_b, _ib, _ab,
         t_miou_i, t_macc_i, t_oa_i, _ii, _ai) = main_aa.test_boundary_inner(
            ref_model, data_list, tcfg)
    assert len(captured) == 2  # one voted-logits scatter per cloud
    torch_preds = [c.argmax(1).numpy() for c in captured]
    # the comparison must be non-vacuous: a collapsed (constant) predictor
    # would agree trivially
    assert len(np.unique(np.concatenate(torch_preds))) >= 5

    # ---- this repo: --mode=test --pretrained_path released.pth ----------
    from amcontrast3d_tpu.engine.cli import main_cli
    results = main_cli("aa", argv=["--cfg", _our_yaml(s3dis_root, tmp_path),
                                   "mode=test", f"pretrained_path={pth}",
                                   "save_pred=True"])

    # ---- per-point predictions ------------------------------------------
    import glob
    run_dirs = glob.glob(str(tmp_path / "log" / "seam" / "*"))
    assert len(run_dirs) == 1
    total = agree = 0
    for i, tp in enumerate(torch_preds):
        ours = np.loadtxt(os.path.join(run_dirs[0], "predictions",
                                       f"cloud_{i}.txt"), dtype=np.int64)
        assert ours.shape == tp.shape
        total += len(tp)
        agree += int((ours == tp).sum())
    frac = agree / total
    assert frac >= 0.998, f"per-point agreement {frac:.4f} ({agree}/{total})"

    # ---- aggregate metrics: whole + boundary/inner ----------------------
    for name, ours_v, torch_v in [
            ("miou", results["miou"], t_miou),
            ("macc", results["macc"], t_macc),
            ("oa", results["oa"], t_oa),
            ("boundary miou", results["boundary"][0], t_miou_b),
            ("boundary macc", results["boundary"][1], t_macc_b),
            ("boundary oa", results["boundary"][2], t_oa_b),
            ("inner miou", results["inner"][0], t_miou_i),
            ("inner macc", results["inner"][1], t_macc_i),
            ("inner oa", results["inner"][2], t_oa_i)]:
        assert abs(float(ours_v) - float(torch_v)) < 0.35, (
            f"{name}: ours {float(ours_v):.3f} vs torch {float(torch_v):.3f}")
    np.testing.assert_allclose(np.asarray(results["ious"], np.float64),
                               np.asarray([float(v) for v in t_ious]),
                               atol=1.0)

    # ---- the CSV row carries the same headline numbers ------------------
    import csv
    csvs = glob.glob(os.path.join(run_dirs[0], "*_test.csv"))
    assert len(csvs) == 1
    rows = list(csv.reader(open(csvs[0])))
    assert rows[0][:5] == ["method", "Area", "OA", "mACC", "mIoU"]
    assert rows[0][5:5 + NCLS] == CLASSES
    assert abs(float(rows[1][2]) - float(t_oa)) < 0.35
    assert abs(float(rows[1][3]) - float(t_macc)) < 0.35
    assert abs(float(rows[1][4]) - float(t_miou)) < 0.35
    assert rows[1][1] == "5"
