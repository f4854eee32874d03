from ros_stereo_slam_tpu.ops import grid as grid  # noqa: F401
from ros_stereo_slam_tpu.ops import interp as interp  # noqa: F401
from ros_stereo_slam_tpu.ops import lk as lk  # noqa: F401
from ros_stereo_slam_tpu.ops import pyramid as pyramid  # noqa: F401
