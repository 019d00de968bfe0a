from neural_imaging_tpu.models import base  # noqa: F401
