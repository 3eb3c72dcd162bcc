"""Hand-written Pallas TPU kernels for the hot fixed-shape ops (NMS, RoI)."""
