"""Registry-surface parity: every name the reference registers must resolve.

Scrapes ``@<REG>.register_module()`` decorators out of ``/root/reference``
(MODELS / LOSS / DATASETS / DataTransforms) and asserts our registries carry
each name, so a surface hole can never reappear silently.  Reference
registries: models/build.py:2, loss/build.py:9, dataset/build.py:10,
transforms/transforms_factory.py:4.
"""
import collections
import pathlib
import re

import pytest

REF = pathlib.Path("/root/reference")

# Reference classes intentionally NOT in our surface, with the reason.
EXEMPT = {
    "DistillBaseSeg": "distillation path, unused by every shipped config "
                      "(models/segmentation/base_seg.py); DistillLoss is "
                      "likewise registry-only in the reference",
    "ResNet": "2D image backbone registered in openpoints for other "
              "projects; no point-cloud config references it",
}


def _scrape():
    pairs = collections.defaultdict(list)
    if not REF.exists():
        pytest.skip("reference checkout not available")
    for p in REF.rglob("*.py"):
        if "nearest_neighbors" in str(p):
            continue
        try:
            txt = p.read_text(errors="ignore")
        except OSError:
            continue
        for m in re.finditer(
                r"@(\w+)\.register_module\(\)\s*\nclass\s+(\w+)", txt):
            pairs[m.group(1)].append(m.group(2))
    return pairs


def test_registry_surface_complete():
    ref = _scrape()
    from amcontrast3d_tpu.models.build import MODELS
    from amcontrast3d_tpu.loss.build import LOSS
    from amcontrast3d_tpu.data.build import DATASETS
    from amcontrast3d_tpu.transforms import DataTransforms
    import amcontrast3d_tpu.models    # noqa: F401 (populate registries)
    import amcontrast3d_tpu.loss      # noqa: F401
    import amcontrast3d_tpu.data      # noqa: F401

    holes = []
    for name, mine in [("MODELS", MODELS), ("LOSS", LOSS),
                       ("DATASETS", DATASETS),
                       ("DataTransforms", DataTransforms)]:
        for cls in ref.get(name, []):
            if cls in EXEMPT:
                continue
            if cls not in mine._module_dict:
                holes.append(f"{name}:{cls}")
    assert not holes, f"registry surface holes vs reference: {holes}"
