"""CI exercise of the day-one real-data drill (script/realdata_smoke.sh):
train → resume → --mode=test against fabricated raw S3DIS rooms with the
UNCHANGED released YAML (only shapes shrunk via CLI overrides)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from amcontrast3d_tpu.data.synthetic import make_room

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def s3dis_root(tmp_path):
    rng = np.random.RandomState(3)
    raw = tmp_path / "s3disfull" / "raw"
    raw.mkdir(parents=True)
    for name in ["Area_1_office_1", "Area_2_office_1", "Area_5_office_1"]:
        pos, color, label = make_room(rng, 3000)
        np.save(raw / f"{name}.npy",
                np.hstack([pos, color * 255.0,
                           label[:, None].astype(np.float32)]))
    return str(tmp_path / "s3disfull")


def test_realdata_smoke_script(s3dis_root, tmp_path):
    out = str(tmp_path / "run")
    env = dict(os.environ)
    env.update(SMOKE_CI="1", SMOKE_EPOCHS="1", JAX_PLATFORMS="cpu")
    # the drill is a single-device run; drop the suite's virtual 8-device
    # mesh flag (batch 2 is not divisible by 8)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        ["bash", os.path.join(REPO, "script", "realdata_smoke.sh"),
         s3dis_root, out],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=1500)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "drill complete" in r.stdout
    # all three legs ran and the CSV has the headline row
    assert "== [2/3] resume" in r.stdout and "== [3/3]" in r.stdout
    import csv
    import glob
    csvs = glob.glob(os.path.join(out, "**", "*_test.csv"), recursive=True)
    assert len(csvs) == 1
    rows = list(csv.reader(open(csvs[0])))
    assert rows[0][:5] == ["method", "Area", "OA", "mACC", "mIoU"]
    assert len(rows) == 2
    assert np.isfinite(float(rows[1][4]))
