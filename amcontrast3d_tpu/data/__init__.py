from .build import (DATASETS, NumpyLoader, build_dataloader_from_cfg,
                    build_dataset_from_cfg, concat_collate_fn,
                    stack_collate_fn)
from .data_util import (bucket_size, crop_pc, fnv_hash_vec,
                        get_class_weights, get_features_by_keys, pad_cloud,
                        voxelize)
from . import s3dis, s3dis_sphere, scannet, semantickitti, synthetic  # noqa: F401  (register datasets)
from .s3dis import S3DIS
from .s3dis_sphere import S3DISSphere
from .semantickitti import (SemanticKITTI, get_semantickitti_file_list,
                            load_label_kitti, load_pc_kitti, remap_lut_read,
                            remap_lut_write)
from .scannet import ScanNet
from .synthetic import Synthetic, make_room

__all__ = [
    "DATASETS", "NumpyLoader", "build_dataloader_from_cfg",
    "build_dataset_from_cfg", "concat_collate_fn", "stack_collate_fn",
    "bucket_size", "crop_pc", "fnv_hash_vec", "get_class_weights",
    "get_features_by_keys", "pad_cloud", "voxelize", "S3DIS", "ScanNet",
    "Synthetic", "make_room",
]
