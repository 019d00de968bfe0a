from neural_imaging_tpu.data.dataset import Dataset  # noqa: F401
from neural_imaging_tpu.data import bayer, loading  # noqa: F401
