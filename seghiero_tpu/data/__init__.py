from seghiero_tpu.data.dataset import HieroDataset, build_dataset
from seghiero_tpu.data.transforms import JointTransform
from seghiero_tpu.data.synthetic import SyntheticShapesDataset
from seghiero_tpu.data.pipeline import BatchLoader, normalize_images

__all__ = [
    "HieroDataset",
    "build_dataset",
    "JointTransform",
    "SyntheticShapesDataset",
    "BatchLoader",
    "normalize_images",
]
