"""flux2-tpu: a TPU-native JAX/XLA/Pallas implementation of the FLUX.2 family.

A ground-up re-design (not a port) of the capabilities of
``VincentGourbin/flux-2-swift-mlx``: the FLUX.2 rectified-flow DiT models
(Dev 32B, Klein 9B/4B and base/KV variants), LLM text encoders (Mistral Small
3.2 24B, Qwen3 4B/8B), the 32-channel VAE (standard + small decoder),
generation pipelines (T2I / multi-reference I2I / img2img strength), chains
(RePaint inpainting, outpainting), LoRA load/merge/training, quantization,
and the surrounding runtime — all expressed as functional JAX programs that
shard over a ``jax.sharding.Mesh`` via pjit/GSPMD with Pallas kernels for the
hot ops.
"""

__version__ = "0.1.0"
