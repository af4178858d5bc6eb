"""AMContrast3D++ trainer (↔ reference examples/segmentation/main_MM.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

from amcontrast3d_tpu.engine.cli import main_cli

if __name__ == "__main__":
    main_cli("mm")
