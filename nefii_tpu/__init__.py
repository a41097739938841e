"""nefii_tpu — a TPU-native (JAX/XLA/Pallas) inverse-rendering framework.

Re-implements the capabilities of NeFII (CVPR 2023, "Inverse Rendering for
Reflectance Decomposition with Near-Field Indirect Illumination"): SDF
geometry, spatially-varying BRDF decomposition, mixture-of-spherical-Gaussian
environment light, and Monte-Carlo path tracing with near-field indirect
illumination — designed TPU-first (SPMD over device meshes, functional
transforms, static shapes, Pallas kernels on the hot paths).
"""

__version__ = "0.1.0"
