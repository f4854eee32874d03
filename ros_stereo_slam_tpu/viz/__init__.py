from ros_stereo_slam_tpu.viz import draw as draw  # noqa: F401
