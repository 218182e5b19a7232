"""drone_oa_iree_vit_accelerator_tpu — TPU-native drone obstacle-avoidance stack.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
OpenHardware-Initiative/Drone-OA-IREE-ViT-Accelerator: an ITA-style
integer-quantized ViT+LSTM policy (depth frame + velocity + attitude ->
velocity command) with

- bit-exact ITA integer attention/FFN arithmetic (int8 matmuls, i32
  accumulation, mult/shift requantization, integer softmax) as a pure-jnp
  golden model and as a fused Pallas TPU kernel,
- QAT in JAX (moving-average min/max observers, straight-through fake
  quant, surrogate-gradient integer softmax),
- a fused preprocessing+inference serving step compiled to one XLA
  program (replacing the ONNX->MLIR->IREE custom-dispatch toolchain),
- batched closed-loop sim rollouts sharded over device meshes.

Layout (see SURVEY.md section 7 for the blueprint):

- ``core``     : configs / dims / dtypes
- ``ops``      : quant math, integer softmax, integer ITA golden model,
                 Pallas kernels
- ``models``   : the ITAViTLSTM model-family (float / QAT / int8)
- ``parallel`` : meshes, shard_map rollout/training sharding
- ``pipeline`` : fused serving step, wire codec, latency harness
- ``sim``      : vectorized obstacle world + closed-loop rollouts
- ``train``    : datasets, float trainer, QAT trainer
- ``utils``    : image ops, logging, profiling
- ``native``   : C++ runtime pieces (wire codec, UDP server)
"""

__version__ = "0.1.0"
