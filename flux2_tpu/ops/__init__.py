from flux2_tpu.ops import attention, latents, normalization, rope, scheduler

__all__ = ["attention", "latents", "normalization", "rope", "scheduler"]
