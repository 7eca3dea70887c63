"""Per-model generation defaults — parity with Flux2Config.swift:9-205."""

from flux2_tpu.models.flux2.config import Flux2Model, FLUX2_DEV, KLEIN_4B, KLEIN_9B


def test_default_steps():
    assert Flux2Model.DEV.default_steps == 28
    for m in (Flux2Model.KLEIN_4B, Flux2Model.KLEIN_9B, Flux2Model.KLEIN_9B_KV):
        assert m.default_steps == 4


def test_default_guidance():
    assert Flux2Model.DEV.default_guidance == 4.0
    assert Flux2Model.KLEIN_4B.default_guidance == 1.0
    assert Flux2Model.KLEIN_4B_BASE.default_guidance == 3.5
    assert Flux2Model.KLEIN_9B_BASE.default_guidance == 3.5


def test_guidance_embeds_only_dev():
    assert Flux2Model.DEV.uses_guidance_embeds
    for m in Flux2Model:
        if m is not Flux2Model.DEV:
            assert not m.uses_guidance_embeds


def test_classical_cfg_base_models_only():
    cfg_models = {m for m in Flux2Model if m.uses_classical_cfg}
    assert cfg_models == {Flux2Model.KLEIN_4B_BASE, Flux2Model.KLEIN_9B_BASE}


def test_kv_cache_support():
    assert Flux2Model.KLEIN_9B_KV.supports_kv_cache
    assert not Flux2Model.KLEIN_9B.supports_kv_cache


def test_max_reference_images():
    assert Flux2Model.DEV.max_reference_images == 6
    assert Flux2Model.KLEIN_4B.max_reference_images == 4


def test_license_flags():
    assert not Flux2Model.DEV.is_commercial_licensed  # BFL non-commercial
    assert Flux2Model.KLEIN_4B.is_commercial_licensed  # Apache-2.0


def test_architecture_dims():
    assert (FLUX2_DEV.num_layers, FLUX2_DEV.num_single_layers) == (8, 48)
    assert FLUX2_DEV.inner_dim == 48 * 128 == 6144
    assert (KLEIN_9B.num_layers, KLEIN_9B.num_single_layers) == (8, 24)
    assert KLEIN_9B.inner_dim == 4096
    assert (KLEIN_4B.num_layers, KLEIN_4B.num_single_layers) == (5, 20)
    assert KLEIN_4B.inner_dim == 3072
    for c in (FLUX2_DEV, KLEIN_9B, KLEIN_4B):
        assert c.mlp_ratio == 3.0
        assert c.rope_theta == 2000.0
        assert c.axes_dims_rope == (32, 32, 32, 32)
        assert c.in_channels == c.out_channels == 128


def test_joint_attention_dims():
    assert Flux2Model.DEV.joint_attention_dim == 15360  # 3 x 5120 Mistral
    assert Flux2Model.KLEIN_4B.joint_attention_dim == 7680  # 3 x 2560 Qwen3-4B
    assert Flux2Model.KLEIN_9B.joint_attention_dim == 12288  # 3 x 4096 Qwen3-8B
