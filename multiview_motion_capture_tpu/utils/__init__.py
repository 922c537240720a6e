from multiview_motion_capture_tpu.utils.profiling import StageTimer  # noqa: F401
