from neural_imaging_tpu.ops.pallas import codebook, jpeg8x8  # noqa: F401
