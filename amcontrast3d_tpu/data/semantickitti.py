"""SemanticKITTI dataset scaffolding
(↔ openpoints/dataset/semantic_kitti/semantickitti.py).

Loads velodyne ``.bin`` scans + ``.label`` files, remaps raw semantic ids to
the 19 train classes via the standard semantic-kitti.yaml learning map (the
reference hardcodes the same tables as ``remap_lut_read``/``remap_lut_write``
and subtracts 1 so 'unlabeled' becomes −1 = ignore).  Host-side neighbor
preprocessing uses the native KD-tree (``amcontrast3d_tpu.native``) instead of
the vendored nanoflann extension.
"""
from __future__ import annotations

import os
from os.path import join
from typing import Optional

import numpy as np

from .build import DATASETS
from .data_util import crop_pc

# semantic-kitti.yaml learning_map (public dataset constant)
_LEARNING_MAP = {
    0: 0, 1: 0, 10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5, 30: 6,
    31: 7, 32: 8, 40: 9, 44: 10, 48: 11, 49: 12, 50: 13, 51: 14, 52: 0,
    60: 9, 70: 15, 71: 16, 72: 17, 80: 18, 81: 19, 99: 0, 252: 1, 253: 7,
    254: 6, 255: 8, 256: 5, 257: 5, 258: 4, 259: 5,
}
_LEARNING_MAP_INV = {
    0: 0, 1: 10, 2: 11, 3: 15, 4: 18, 5: 20, 6: 30, 7: 31, 8: 32, 9: 40,
    10: 44, 11: 48, 12: 49, 13: 50, 14: 51, 15: 70, 16: 71, 17: 72,
    18: 80, 19: 81,
}


def _make_lut(mapping, size=260):
    lut = np.zeros(size, dtype=np.int32)
    for k, v in mapping.items():
        lut[k] = v
    return lut


remap_lut_read = _make_lut(_LEARNING_MAP)
remap_lut_write = _make_lut(_LEARNING_MAP_INV, size=20)


def load_pc_kitti(pc_path: str) -> np.ndarray:
    scan = np.fromfile(pc_path, dtype=np.float32).reshape(-1, 4)
    return scan[:, 0:3]


def load_label_kitti(label_path: str, remap_lut: np.ndarray) -> np.ndarray:
    label = np.fromfile(label_path, dtype=np.uint32).reshape(-1)
    sem_label = label & 0xFFFF
    return (remap_lut[sem_label] - 1).astype(np.int32)  # unlabeled → −1


def get_semantickitti_file_list(dataset_path: str, test_seq_num: str):
    seq_list = np.sort(os.listdir(dataset_path))
    train_list, val_list, test_list = [], [], []
    for seq_id in seq_list:
        seq_path = join(dataset_path, seq_id)
        pc_path = join(seq_path, 'velodyne')
        label_path = join(seq_path, 'labels')
        if not os.path.isdir(pc_path):
            continue
        pairs = [[join(pc_path, f), join(label_path, f.replace('bin', 'label'))]
                 for f in np.sort(os.listdir(pc_path))]
        if seq_id == '08':
            val_list.extend(pairs)
            if seq_id == test_seq_num:
                test_list.extend(pairs)
        elif int(seq_id) >= 11 and seq_id == test_seq_num:
            test_list.extend(pairs)
        elif seq_id in ['00', '01', '02', '03', '04', '05', '06', '07',
                        '09', '10']:
            train_list.extend(pairs)
    return train_list, val_list, test_list


@DATASETS.register_module()
class SemanticKITTI:
    classes = ['car', 'bicycle', 'motorcycle', 'truck', 'other-vehicle',
               'person', 'bicyclist', 'motorcyclist', 'road', 'parking',
               'sidewalk', 'other-ground', 'building', 'fence', 'vegetation',
               'trunk', 'terrain', 'pole', 'traffic-sign']
    num_classes = 19
    ignore_index = -1
    gravity_dim = 2

    def __init__(self, data_root: str = 'data/SemanticKITTI',
                 split: str = 'train', voxel_size: float = 0.06,
                 voxel_max: Optional[int] = None, transform=None,
                 loop: int = 1, presample: bool = False,
                 presampled_root: Optional[str] = None,
                 variable: bool = False, shuffle: bool = True,
                 test_id: int = 0, **kwargs):
        """``presampled_root``: root of a RandLA-style preprocessing cache
        built by ``tools/prepare_semantickitti.py`` (↔ the reference's
        ``preprocess/data_pre.py`` output).  When set, scans load the
        grid-subsampled ``velodyne/*.npy`` + ``y/*.npy`` directly (and the
        runtime voxelize pass is skipped — the cache already is the 0.06
        grid); the ``proj/*_proj.pkl`` indices up-project predictions for
        full-resolution scoring/export."""
        self.split, self.voxel_size, self.transform = split, voxel_size, transform
        self.voxel_max, self.loop = voxel_max, loop
        self.presample = presample
        self.presampled_root = presampled_root
        self.variable, self.shuffle = variable, shuffle
        seq_dir = join(data_root, 'sequences')
        train_list, val_list, test_list = get_semantickitti_file_list(
            seq_dir, str(test_id + 11))
        self.data_list = {'train': train_list, 'val': val_list,
                          'test': test_list}[split]
        assert len(self.data_list) > 0, f"no scans under {seq_dir}"
        self.data_idx = np.arange(len(self.data_list))
        self._grid_checked = set()

    def _check_cache_grid(self, seq_root):
        """Assert the cache's recorded grid size matches voxel_size (a cache
        built with a different --grid would otherwise load silently).  Old
        caches without meta.json are accepted for compatibility."""
        if seq_root in self._grid_checked:
            return
        meta_file = join(seq_root, 'meta.json')
        if os.path.exists(meta_file):
            import json
            with open(meta_file) as f:
                grid = json.load(f).get('grid_size')
            if grid is not None and abs(grid - self.voxel_size) > 1e-9:
                raise ValueError(
                    f"presampled cache {seq_root} was built with "
                    f"--grid {grid} but the dataset expects voxel_size="
                    f"{self.voxel_size}; rebuild the cache or fix the config")
        self._grid_checked.add(seq_root)

    def _load_presampled(self, pc_path):
        """Read a cache entry for this scan: (points, labels or None)."""
        seq_id = os.path.basename(os.path.dirname(os.path.dirname(pc_path)))
        stem = os.path.splitext(os.path.basename(pc_path))[0]
        root = join(self.presampled_root, seq_id)
        self._check_cache_grid(root)
        points = np.load(join(root, 'velodyne', stem + '.npy'))
        label_file = join(root, 'y', stem + '.npy')
        if os.path.exists(label_file):
            # cache stores 0..19 with 0=unlabeled; shift to −1-ignore space
            labels = np.load(label_file).astype(np.int32) - 1
        else:
            labels = None
        return points, labels

    def projection_indices(self, pc_path):
        """raw→subsampled 1-NN indices for full-resolution up-projection
        (benchmark export); requires the cache's proj/ entry."""
        if self.presampled_root is None:
            raise ValueError(
                "projection_indices requires presampled_root (a cache built "
                "by tools/prepare_semantickitti.py with proj/ entries)")
        import pickle
        seq_id = os.path.basename(os.path.dirname(os.path.dirname(pc_path)))
        stem = os.path.splitext(os.path.basename(pc_path))[0]
        with open(join(self.presampled_root, seq_id, 'proj',
                       stem + '_proj.pkl'), 'rb') as f:
            return np.asarray(pickle.load(f)[0], np.int64)

    def __getitem__(self, idx):
        pc_path, label_path = self.data_list[self.data_idx[idx % len(self.data_idx)]]
        if self.presampled_root is not None:
            points, labels = self._load_presampled(pc_path)
            if labels is None:
                if self.split != 'test':
                    # match the raw path's behavior: a train/val scan whose
                    # cache entry lacks labels is an error, never silently
                    # zero-filled (zeros are class 0 = 'car' after the
                    # ignore shift)
                    raise FileNotFoundError(
                        f"presampled cache has no labels for {pc_path} "
                        f"(split={self.split})")
                labels = np.zeros(len(points), np.int32)
            downsample = False  # the cache IS the grid subsample
        else:
            points = load_pc_kitti(pc_path)
            labels = (load_label_kitti(label_path, remap_lut_read)
                      if self.split != 'test'
                      else np.zeros(len(points), np.int32))
            downsample = not self.presample
        points, _, labels = crop_pc(points, None, labels[:, None], self.split,
                                    self.voxel_size, self.voxel_max,
                                    downsample=downsample,
                                    variable=self.variable,
                                    shuffle=self.shuffle)
        data = {'pos': points.astype(np.float32),
                'y': labels.squeeze(-1).astype(np.int64)}
        if self.transform is not None:
            data = self.transform(data)
        if 'heights' not in data:
            data['heights'] = (points[:, 2:3] - points[:, 2:3].min()).astype(np.float32)
        return data

    def __len__(self):
        return len(self.data_idx) * self.loop
