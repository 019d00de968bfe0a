from neural_imaging_tpu.utils import utils, fsutil, paramspec, metrics, stats, image, jsonlog  # noqa: F401
