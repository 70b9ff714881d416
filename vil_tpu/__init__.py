"""vil_tpu — a TPU-native (JAX/XLA/Pallas/pjit) vision-longformer framework.

A from-scratch rebuild of the capabilities of microsoft/vision-longformer
(multi-stage MsViT with pluggable efficient attention, headlined by 2-D
sliding-chunk local attention) designed for TPU: static shapes, functional
transforms, fused Pallas kernels for the hot attention path, and
``jax.sharding`` data parallelism.
"""

__version__ = "0.1.0"
