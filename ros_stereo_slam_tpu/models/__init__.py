from ros_stereo_slam_tpu.models import frontend as frontend  # noqa: F401
from ros_stereo_slam_tpu.models import pipeline as pipeline  # noqa: F401
from ros_stereo_slam_tpu.models import state as state  # noqa: F401
