from .config import EasyConfig
from .registry import Registry
from .metrics import (PSNR, AverageMeter, ConfusionMatrix, IoU_from_confusions,
                      SegMetric, confusion_matrix_update, get_mious,
                      partnet_metrics, shapenetpart_metrics)
from .logger import (generate_exp_directory, resume_exp_directory,
                     setup_logger_dist, write_to_csv)
from .ckpt import load_checkpoint, resume_checkpoint, save_checkpoint
from .random import set_random_seed

__all__ = [
    "EasyConfig", "Registry", "AverageMeter", "ConfusionMatrix",
    "PSNR", "SegMetric", "IoU_from_confusions", "partnet_metrics",
    "shapenetpart_metrics",
    "confusion_matrix_update", "get_mious", "generate_exp_directory",
    "write_to_csv",
    "resume_exp_directory", "setup_logger_dist", "load_checkpoint",
    "resume_checkpoint", "save_checkpoint", "set_random_seed",
]
