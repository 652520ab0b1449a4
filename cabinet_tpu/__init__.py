"""CABiNet-TPU: a TPU-native JAX/Flax/Pallas real-time semantic-segmentation framework.

Re-implementation (not a port) of the capabilities of dronefreak/CABiNet:
dual-branch CABiNet models (MobileNetV3 backbone + Context Aggregation Block),
shared dataset pipeline for UAVid / AeroScapes / VDD / Cityscapes, OHEM training,
multi-scale sliding-window evaluation, and a YOLO-sem dense head — all designed
for TPU (NHWC layouts, static shapes, SPMD over jax.sharding meshes, Pallas
kernels for the hot ops).
"""

__version__ = "0.1.0"
