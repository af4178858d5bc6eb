"""Synthetic room dataset — deterministic stand-in for S3DIS when no data is
mounted (tests, benchmarking, CI).  Generates procedural "rooms": planar
floor/ceiling/walls plus random boxes, with labels tied to geometry so the
segmentation task is learnable and mIoU is meaningful.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .build import DATASETS
from .data_util import crop_pc


def make_room(rng: np.random.RandomState, n_points: int = 40000,
              num_classes: int = 13):
    """Procedural room: floor(1)/ceiling(0)/walls(2) + furniture boxes."""
    w, d, h = rng.uniform(4, 8), rng.uniform(4, 8), rng.uniform(2.5, 3.5)
    parts = []

    def plane(n, label, fixed_dim, fixed_val):
        p = rng.rand(n, 3) * [w, d, h]
        p[:, fixed_dim] = fixed_val + rng.randn(n) * 0.01
        lab = np.full(n, label)
        return p, lab

    n_plane = n_points // 6
    parts.append(plane(n_plane, 1, 2, 0.0))       # floor
    parts.append(plane(n_plane, 0, 2, h))         # ceiling
    parts.append(plane(n_plane // 2, 2, 0, 0.0))  # walls
    parts.append(plane(n_plane // 2, 2, 0, w))
    parts.append(plane(n_plane // 2, 2, 1, 0.0))
    parts.append(plane(n_plane // 2, 2, 1, d))
    remaining = n_points - sum(len(p) for p, _ in parts)
    n_boxes = rng.randint(3, 8)
    for b in range(n_boxes):
        n = remaining // n_boxes
        if n <= 0:
            break
        cx, cy = rng.uniform(0.5, w - 0.5), rng.uniform(0.5, d - 0.5)
        sx, sy, sz = rng.uniform(0.3, 1.2, 3)
        p = (rng.rand(n, 3) - 0.5) * [sx, sy, sz] + [cx, cy, sz / 2]
        lab = np.full(n, 3 + (b % (num_classes - 3)))
        parts.append((p, lab))
    pos = np.concatenate([p for p, _ in parts]).astype(np.float32)
    label = np.concatenate([l for _, l in parts]).astype(np.int64)
    color = np.zeros_like(pos)
    for c in range(num_classes):
        m = label == c
        base = np.array([(c * 53) % 255, (c * 101) % 255, (c * 197) % 255]) / 255.0
        color[m] = base + rng.randn(m.sum(), 3) * 0.05
    color = np.clip(color, 0, 1).astype(np.float32)
    return pos, color, label


@DATASETS.register_module()
class Synthetic:
    """Registered as a drop-in dataset: same cfg keys as S3DIS."""
    classes = [f"class_{i}" for i in range(13)]
    num_classes = 13
    gravity_dim = 2

    def __init__(self, num_rooms: int = 4, n_points: int = 20000,
                 num_classes: int = 13, voxel_size: float = 0.04,
                 voxel_max: Optional[int] = None, split: str = 'train',
                 transform=None, loop: int = 1, seed: int = 0,
                 variable: bool = False, shuffle: bool = True, **kwargs):
        self.num_classes = num_classes
        self.split, self.voxel_size, self.transform = split, voxel_size, transform
        self.voxel_max, self.loop = voxel_max, loop
        self.variable, self.shuffle = variable, shuffle
        rng = np.random.RandomState(seed + (0 if split == 'train' else 777))
        self.rooms = [make_room(rng, n_points, num_classes)
                      for _ in range(num_rooms)]
        self.data_idx = np.arange(num_rooms)

    def __getitem__(self, idx):
        pos, color, label = self.rooms[idx % len(self.rooms)]
        coord, feat, label = crop_pc(
            pos.copy(), (color * 255).copy(), label.copy()[:, None],
            self.split, self.voxel_size, self.voxel_max,
            downsample=True, variable=self.variable, shuffle=self.shuffle)
        data = {'pos': coord, 'x': feat, 'y': label.squeeze(-1)}
        if self.transform is not None:
            data = self.transform(data)
        if 'heights' not in data:
            data['heights'] = data['pos'][:, 2:3].astype(np.float32)
        return data

    def __len__(self):
        return len(self.data_idx) * self.loop
