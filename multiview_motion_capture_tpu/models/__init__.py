from multiview_motion_capture_tpu.models.pose_net import (  # noqa: F401
    PoseNet,
    PoseNetConfig,
    decode_heatmaps,
    gaussian_heatmaps,
)
