from multiview_motion_capture_tpu.data.ingest import (  # noqa: F401
    FrameBatch,
    filter_bad_poses,
    load_openpose_dir,
    load_frame_batch,
    save_frame_batch,
)
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence  # noqa: F401
