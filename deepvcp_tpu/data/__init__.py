from deepvcp_tpu.data.datasets import (
    KITTIDataset,
    ModelNet40Dataset,
    RegistrationPair,
    SyntheticDataset,
    batch_iterator,
    read_velodyne_bin,
)
from deepvcp_tpu.data.transforms import make_pair, random_pose, resample

__all__ = [
    "ModelNet40Dataset",
    "KITTIDataset",
    "SyntheticDataset",
    "RegistrationPair",
    "batch_iterator",
    "read_velodyne_bin",
    "make_pair",
    "random_pose",
    "resample",
]
