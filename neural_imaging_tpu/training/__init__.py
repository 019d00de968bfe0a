from neural_imaging_tpu.training import compression, manipulation, pipeline, validation  # noqa: F401
