"""SemanticKITTI RandLA-style preprocessing cache builder.

TPU-native port of the reference cache builder
(``openpoints/dataset/semantic_kitti/preprocess/data_pre.py:188-242`` +
``helper_tool.py DataProcessing``): per scan, grid-subsample the velodyne
cloud (barycenter points, majority label), build a KD-tree over the
subsampled points, and store the 1-NN projection indices of every RAW point
into the subsampled cloud (used to up-project predictions for full-
resolution scoring / benchmark export).

Differences from the reference, by design:
  * the C++ ops are this repo's native library (``amcontrast3d_tpu.native``:
    ``grid_subsampling`` ↔ vendored cpp_subsampling, ``kdtree_knn`` ↔
    vendored nanoflann ``nearest_neighbors``) — no compiled third-party
    trees;
  * the KDTree pickle stores the subsampled points array (portable; the
    native KD-tree rebuilds in milliseconds at load) instead of a pickled
    sklearn object.  If scikit-learn is importable and ``--sklearn-trees``
    is passed, a real ``sklearn.neighbors.KDTree`` pickle is written for
    byte-level consumer compatibility.

Output layout (identical paths to the reference):
    <out>/<seq>/velodyne/<scan>.npy      float32 (M, 3) subsampled points
    <out>/<seq>/y/<scan>.npy             int32  (M,)    subsampled labels
    <out>/<seq>/KDTree/<scan>.pkl        tree payload (see above)
    <out>/<seq>/proj/<scan>_proj.pkl     [int32 (N,)] raw→sub 1-NN indices
                                         (seq 08 + test sequences)

Usage:
    python tools/prepare_semantickitti.py <dataset>/sequences <out> \
        [--grid 0.06] [--sklearn-trees]
"""
import argparse
import json
import os
import pickle
import sys
from os.path import exists, join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amcontrast3d_tpu.data.semantickitti import (load_label_kitti,
                                                 load_pc_kitti,
                                                 remap_lut_read)
from amcontrast3d_tpu.native import grid_subsampling, kdtree_knn

TRAIN_SEQS = ['00', '01', '02', '03', '04', '05', '06', '07', '09', '10']


def _tree_payload(sub_points, use_sklearn):
    if use_sklearn:
        from sklearn.neighbors import KDTree
        return KDTree(sub_points)
    return {"format": "amc3d_points_v1", "points": sub_points}


def _proj_indices(sub_points, raw_points):
    """1-NN of every raw point into the subsampled cloud (exact, native
    KD-tree ↔ search_tree.query(points), data_pre.py:219/234)."""
    idx, _ = kdtree_knn(np.ascontiguousarray(sub_points, np.float32),
                        np.ascontiguousarray(raw_points, np.float32), 1)
    return np.asarray(idx, np.int32).reshape(-1)


def prepare_scan(pc_file, label_file, grid_size, out_dirs, scan_stem,
                 need_proj, use_sklearn):
    points = load_pc_kitti(pc_file)
    if label_file is not None and not exists(label_file):
        # a train/val sequence with a missing .label file is a broken
        # dataset, not an unlabeled scan — failing here keeps the error at
        # the cause instead of surfacing as the loader's FileNotFoundError
        # at training time
        raise FileNotFoundError(
            f"labeled sequence: {label_file} missing for scan {pc_file}")
    if label_file is not None:
        # labels stay in the 0..19 space with 0=unlabeled (the reference
        # cache stores the remapped-but-unshifted labels; the −1 ignore
        # shift happens at load time, semantickitti.py)
        labels = (load_label_kitti(label_file, remap_lut_read) + 1).astype(
            np.int32)
        sub_points, sub_labels = grid_subsampling(
            points, labels=labels, sampleDl=grid_size)
        np.save(join(out_dirs["y"], scan_stem), sub_labels.reshape(-1))
    else:
        sub_points = grid_subsampling(points, sampleDl=grid_size)
    sub_points = np.ascontiguousarray(sub_points, np.float32)
    np.save(join(out_dirs["velodyne"], scan_stem), sub_points)
    with open(join(out_dirs["KDTree"], scan_stem + ".pkl"), "wb") as f:
        pickle.dump(_tree_payload(sub_points, use_sklearn), f)
    if need_proj:
        proj = _proj_indices(sub_points, points)
        with open(join(out_dirs["proj"], scan_stem + "_proj.pkl"),
                  "wb") as f:
            pickle.dump([proj], f)
    return len(points), len(sub_points)


def prepare_sequence(seq_path, seq_out, seq_id, grid_size,
                     use_sklearn=False, log=print):
    pc_path = join(seq_path, 'velodyne')
    label_path = join(seq_path, 'labels')
    out_dirs = {name: join(seq_out, name)
                for name in ("velodyne", "y", "KDTree", "proj")}
    for d in out_dirs.values():
        os.makedirs(d, exist_ok=True)
    # record the grid size so the loader can assert cache-vs-config
    # agreement (a 0.3-grid cache loaded under a 0.06 config is silent
    # corruption otherwise)
    with open(join(seq_out, "meta.json"), "w") as f:
        json.dump({"grid_size": grid_size}, f)
    has_labels = seq_id in TRAIN_SEQS or seq_id == '08'
    # proj indices: seq 08 (val) and EVERY test sequence (>= 11), matching
    # the reference builder's else-branch (data_pre.py:225-242) — predictions
    # on any test sequence need full-resolution up-projection
    need_proj = seq_id == '08' or (seq_id.isdigit() and int(seq_id) >= 11)
    for scan in sorted(os.listdir(pc_path)):
        stem = os.path.splitext(scan)[0]
        lf = join(label_path, stem + '.label') if has_labels else None
        n, m = prepare_scan(join(pc_path, scan), lf, grid_size, out_dirs,
                            stem, need_proj, use_sklearn)
        log(f"  {seq_id}/{scan}: {n} -> {m} pts")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequences", help="<dataset>/sequences directory")
    ap.add_argument("out", help="output root")
    ap.add_argument("--grid", type=float, default=0.06,
                    help="grid size (reference: 0.06)")
    ap.add_argument("--sklearn-trees", action="store_true")
    args = ap.parse_args()
    for seq_id in sorted(os.listdir(args.sequences)):
        seq_path = join(args.sequences, seq_id)
        if not os.path.isdir(join(seq_path, 'velodyne')):
            continue
        print(f"sequence {seq_id} start")
        prepare_sequence(seq_path, join(args.out, seq_id), seq_id,
                         args.grid, args.sklearn_trees)


if __name__ == "__main__":
    main()
