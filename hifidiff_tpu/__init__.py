"""hifidiff_tpu — a TPU-native JAX/XLA/Pallas framework for high-fidelity
face hallucination, re-designed from scratch with the capabilities of the
HifiDiff reference (js43o/HifiDiff).

Design stance (not a port):
  * NHWC layout everywhere (TPU conv-native); weight import from PyTorch
    checkpoints transposes OIHW->HWIO at the boundary.
  * Pure functions + pytree params (flax.linen); no mutable modules.
  * The 50-step DDIM reverse loop is one `jax.lax.scan` inside one `jit`.
  * Parallelism is declared, not written: `jax.sharding.Mesh` + NamedSharding;
    XLA inserts the collectives over ICI/DCN.
  * Hot pointwise chains (LayerNorm2d + FiLM + SimpleGate) are fused Pallas
    kernels with custom VJPs.
"""

__version__ = "0.1.0"
