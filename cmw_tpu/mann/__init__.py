"""MANN mixture-of-experts trajectory generation (TPU-native).

Replaces the reference's onnxruntime-backed BLF `ML::MANNTrajectoryGenerator`
+ `MANNAutoregressiveInputBuilder` (CentroidalMPCBlock.cpp:167-188,452-509)
with a pure-JAX forward of the same mixture-of-experts network (weights
imported straight from the shipped ONNX files), a lax.scan autoregressive
rollout, Schmitt-trigger contact extraction, and the ellipsoid-limited
joystick input builder.
"""
