from .tum import TumDataset, associate, read_trajectory_file, write_trajectory  # noqa: F401
from .synthetic import SyntheticWorld, render_sequence  # noqa: F401
# rosbag/render3d/pointcloud/visualization are imported lazily by their
# consumers (keeps the base import path light).
