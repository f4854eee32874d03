from ros_stereo_slam_tpu.parallel import dist_ba as dist_ba  # noqa: F401
from ros_stereo_slam_tpu.parallel import dist_map as dist_map  # noqa: F401
from ros_stereo_slam_tpu.parallel import dist_pgo as dist_pgo  # noqa: F401
from ros_stereo_slam_tpu.parallel import mesh as mesh  # noqa: F401
