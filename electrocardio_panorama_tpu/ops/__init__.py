"""TPU-native compute ops: convs, resampling, ROI ops, angular encoding."""

from electrocardio_panorama_tpu.ops.convs import (
    batch_norm1d,
    group_batch_norm1d,
    conv1d,
    conv_transpose1d_k2s2,
    dropout,
    linear,
    max_pool1d,
)
from electrocardio_panorama_tpu.ops.resample import interp_linear_coords, upsample_linear_x2
from electrocardio_panorama_tpu.ops.roi import (
    roi_align_1d,
    roi_pool_1d,
    roi_reverse_1d,
    roi_reverse_1d_gather,
)
from electrocardio_panorama_tpu.ops.theta import angular_encode, theta_feature_dim

__all__ = [
    "angular_encode",
    "theta_feature_dim",
    "conv1d",
    "conv_transpose1d_k2s2",
    "max_pool1d",
    "linear",
    "dropout",
    "batch_norm1d",
    "group_batch_norm1d",
    "upsample_linear_x2",
    "interp_linear_coords",
    "roi_align_1d",
    "roi_reverse_1d",
    "roi_reverse_1d_gather",
    "roi_pool_1d",
]
