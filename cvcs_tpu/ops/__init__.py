"""TPU-oriented compute ops: resize/upsample, fused losses, confusion-matrix
accumulation, and Pallas kernels for the hot paths."""
