"""Multi-method result viewer (↔ reference examples/segmentation/vis_results.py).

Headless variant: reads the .obj files written by the test path (gt / per-
method predictions) and re-exports a side-by-side scene with per-method x
offsets — viewable in any mesh tool.

    python examples/segmentation/vis_results.py out.obj method1.obj method2.obj
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

import numpy as np

from amcontrast3d_tpu.utils.vis import read_obj, write_obj


def main(paths, out="vis_combined.obj", gap=1.2):
    clouds = [read_obj(p) for p in paths]
    all_pts, all_cols = [], []
    offset = 0.0
    for pts, cols in clouds:
        width = pts[:, 0].max() - pts[:, 0].min()
        shifted = pts.copy()
        shifted[:, 0] += offset - pts[:, 0].min()
        offset += width * gap
        all_pts.append(shifted)
        all_cols.append(cols if cols is not None
                        else np.full_like(shifted, 0.5))
    write_obj(np.concatenate(all_pts), np.concatenate(all_cols), out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
