"""Host-side data pipeline: datasets, transforms, loader, IO.

Unlike the reference, the host pipeline stops at sampled point clouds —
lattice construction happens on device inside the jitted step — so workers
only load .npy files and run cheap numpy augmentation/sampling.
"""

from .transforms import ProcessData, Augmentation  # noqa: F401
from .datasets import FlyingThings3DSubset, KITTI, DATASETS  # noqa: F401
from .loader import BatchLoader  # noqa: F401
