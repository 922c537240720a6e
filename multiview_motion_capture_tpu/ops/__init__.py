from multiview_motion_capture_tpu.ops import geometry  # noqa: F401
from multiview_motion_capture_tpu.ops import triangulate  # noqa: F401
from multiview_motion_capture_tpu.ops import association  # noqa: F401
from multiview_motion_capture_tpu.ops import fk  # noqa: F401
from multiview_motion_capture_tpu.ops import ik  # noqa: F401
