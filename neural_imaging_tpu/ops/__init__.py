from neural_imaging_tpu.ops import color, dct, kernels, manipulations, ops, quantization, ssim  # noqa: F401
