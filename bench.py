"""Benchmark: FLUX.2 Klein-4B denoise steps/sec on the available device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference runs Klein-4B 1024x1024 bf16 at
~5.5 s/denoise-step on an M2 Ultra (25.3 s / 4 steps + overhead; the
per-step figure from docs/examples/quantization-benchmark). We measure the
same quantity — wall time per denoise step of the full Klein-4B DiT at
1024x1024 (4096 image tokens + 512 text tokens), bf16 — on one TPU chip and
report steps/sec with vs_baseline = (our s/step baseline) / (our s/step).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_SEC_PER_STEP = 5.5  # Klein-4B 1024^2 bf16, M2 Ultra (BASELINE.md)


def main():
    from flux2_tpu.models.flux2 import config as cfg
    from flux2_tpu.models.flux2 import transformer as tfm
    from flux2_tpu.ops import latents as lu
    from flux2_tpu.ops.rope import rope_embeddings

    config = cfg.KLEIN_4B
    params = tfm.init_params(jax.random.PRNGKey(0), config, dtype=jnp.bfloat16)

    h = w = 1024
    s_txt = 512
    s_img = (h // 16) * (w // 16)  # 4096
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, s_img, 128), jnp.bfloat16)
    txt = jax.random.normal(
        jax.random.PRNGKey(2), (1, s_txt, config.joint_attention_dim), jnp.bfloat16
    )
    ids = np.concatenate([lu.text_position_ids(s_txt), lu.image_position_ids(h, w)], axis=0)
    cos, sin = rope_embeddings(jnp.asarray(ids))

    @jax.jit
    def step(params, hidden, txt, t):
        return tfm.forward(params, config, hidden, txt, t, cos, sin)

    t_in = jnp.array([0.5], jnp.float32)
    # warmup/compile
    step(params, hidden, txt, t_in).block_until_ready()

    n = 8
    t0 = time.perf_counter()
    out = hidden
    for _ in range(n):
        out = step(params, out, txt, t_in)
    out.block_until_ready()
    sec_per_step = (time.perf_counter() - t0) / n

    print(
        json.dumps(
            {
                "metric": "klein4b_denoise_step_1024px_bf16",
                "value": round(1.0 / sec_per_step, 3),
                "unit": "steps/sec",
                "vs_baseline": round(REFERENCE_SEC_PER_STEP / sec_per_step, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
