"""
neural_imaging_tpu — a TPU-native (JAX/XLA/Pallas) framework for modeling and joint
optimization of the photo acquisition → distribution → forensic analysis chain.

Re-designed from scratch for TPU hardware with the capabilities of the
pkorus/neural-imaging toolbox (reference layer map documented in SURVEY.md):

- camera ISP model zoo (INet / UNet / DNet / ONet / ClassicISP) as jit-compiled
  flax modules (``neural_imaging_tpu.models.pipelines``)
- a differentiable JPEG codec built on batched 8x8 DCT matmuls that map onto the
  TPU MXU, with an optional fused Pallas kernel (``neural_imaging_tpu.models.jpeg``)
- a learned lossy codec (TwitterDCN) with soft-codebook quantization and a
  differentiable entropy estimator (``neural_imaging_tpu.models.compression``)
- an actual bitstream codec backed by a native C++ ANS entropy coder
  (``neural_imaging_tpu.compression``)
- a forensic analysis network (FAN) with a constrained residual first layer
  (``neural_imaging_tpu.models.forensics``)
- the joint manipulation-classification workflow compiled into ONE jitted train
  step (``neural_imaging_tpu.workflows``)
- data-parallel scale-out over a ``jax.sharding.Mesh``
  (``neural_imaging_tpu.parallel``)
"""

__version__ = '0.1.0'
