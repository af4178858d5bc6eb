from .knn import (knn, knn_flat, ball_query, square_distance,
                  set_knn_backend)
from .fps import furthest_point_sample, random_sample
from .group import (CHANNEL_MAP, Grouper, clamp_members_valid, create_grouper, gather_points,
                    get_aggregation_features, group_points)
from .interpolate import three_interpolate, three_interpolation, three_nn
from .ambiguity import (ambiguity_from_stats, ambiguity_function,
                        ambiguity_histogram)
from .contrast_pallas import (contrast_reductions,
                              contrast_reductions_selfk, label_vote)
from .chamfer import chamfer_distance_l1, chamfer_distance_l2, chamfer_raw
from .emd import approx_match, earth_mover_distance, match_cost
from .dilated_knn import dilated_knn
from .pointops_extra import aggregation, interpolation, interpolation2, subtraction

__all__ = [
    "knn", "knn_flat", "ball_query", "square_distance", "set_knn_backend",
    "furthest_point_sample", "random_sample",
    "CHANNEL_MAP", "Grouper", "create_grouper", "gather_points",
    "get_aggregation_features", "group_points",
    "three_interpolate", "three_interpolation", "three_nn",
    "ambiguity_from_stats", "ambiguity_function", "ambiguity_histogram",
    "contrast_reductions", "contrast_reductions_selfk", "label_vote",
    "chamfer_distance_l1", "chamfer_distance_l2", "chamfer_raw",
    "approx_match", "earth_mover_distance", "match_cost",
    "dilated_knn", "aggregation", "interpolation", "interpolation2", "subtraction",
]
