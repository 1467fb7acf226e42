"""pram_tpu — TPU-native (JAX / XLA / Pallas / pjit) visual localization framework.

A ground-up rebuild of the capabilities of feixue94/pram ("Place Recognition
Anywhere Model"): sparse keypoint extraction (SFD2 / SuperPoint), transformer
landmark recognition over keypoint tokens (SegNet / SegNetViT), attentional
graph matching with Sinkhorn optimal transport (GM / GML / AdaGML), and
landmark-wise 2D-3D registration with on-device batched PnP + RANSAC.

Everything on the query path is fixed-shape, batched and jit-compiled; maps are
packed arrays resident in HBM; parallelism is expressed with jax.sharding over
device meshes.
"""

__version__ = "0.1.0"
