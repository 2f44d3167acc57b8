from .resize import bilinear_resize, resize_like_torch
from .pool import adaptive_avg_pool, global_avg_pool, max_pool_3x3_s2_p1
from .distance import distance_logits, one_hot_center_logits, prototype_distance
