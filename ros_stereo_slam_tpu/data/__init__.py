from ros_stereo_slam_tpu.data import kitti as kitti  # noqa: F401
from ros_stereo_slam_tpu.data import synthetic as synthetic  # noqa: F401
