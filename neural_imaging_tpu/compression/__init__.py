from neural_imaging_tpu.compression import jpeg_helpers  # noqa: F401
