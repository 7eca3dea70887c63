"""Cross-framework fidelity: our generic GQA decoder vs HuggingFace
transformers' torch reference implementations with IDENTICAL weights.

The reference validates its Mistral/Qwen3 ports against mlx-lm outputs
(SURVEY.md §4); with no checkpoints in this environment, HF transformers
(torch CPU) is the independent oracle: random-init a tiny HF model, map its
state_dict through ``map_decoder_weights`` (the same path real checkpoints
take), and demand logits + hidden-state agreement.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flux2_tpu.io.weight_mapping import map_decoder_weights
from flux2_tpu.models.text_encoders import decoder as dec
from flux2_tpu.models.text_encoders.config import DecoderConfig

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier


def _to_numpy_state(model):
    return {k: v.detach().to(torch.float32).numpy() for k, v in model.state_dict().items()}


def _run_ours(cfg, params, ids, mask):
    hs = dec.forward_hidden_states(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    logits = dec.forward_logits(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    return np.asarray(hs), np.asarray(logits)


def _run_hf(model, ids, mask):
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            output_hidden_states=True,
        )
    hs = np.stack([h.to(torch.float32).numpy() for h in out.hidden_states])
    return hs, out.logits.to(torch.float32).numpy()


def _compare(cfg, params, model, seed=0):
    rng = np.random.default_rng(seed)
    b, s = 2, 12
    ids = rng.integers(0, cfg.vocab_size, size=(b, s))
    # row 0 dense; row 1 LEFT-padded (the conditioning recipe's padding side)
    mask = np.ones((b, s), np.int64)
    mask[1, :4] = 0
    ids[1, :4] = 0

    ours_hs, ours_logits = _run_ours(cfg, params, ids, mask)
    hf_hs, hf_logits = _run_hf(model, ids, mask)

    # HF's LAST hidden state is post-final-norm; ours is the raw layer output
    # (the conditioning recipe never reads the last layer). Compare the rest.
    valid = mask.astype(bool)
    for li in range(cfg.num_hidden_layers):  # embeddings + all but last
        d = np.abs(ours_hs[li] - hf_hs[li])[valid].max()
        assert d < 5e-5, (li, d)
    dlog = np.abs(ours_logits - hf_logits)[valid].max()
    assert dlog < 5e-4, dlog


def test_qwen3_parity_vs_hf():
    """Qwen3 semantics: GQA + per-head q/k RMSNorm before RoPE + tied lm_head."""
    hf_cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, rms_norm_eps=1e-6, rope_theta=1_000_000.0,
        tie_word_embeddings=True, attention_bias=False,
    )
    torch.manual_seed(0)
    model = transformers.Qwen3ForCausalLM(hf_cfg).eval()

    cfg = DecoderConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, rms_norm_eps=1e-6, rope_theta=1_000_000.0,
        tie_word_embeddings=True, qk_norm=True,
    )
    params = map_decoder_weights(_to_numpy_state(model), cfg)
    _compare(cfg, params, model)


def test_mistral_parity_vs_hf():
    """Mistral semantics: plain GQA, untied lm_head, no qk-norm."""
    hf_cfg = transformers.MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=1e-5, rope_theta=1_000_000.0,
        tie_word_embeddings=False, sliding_window=None,
    )
    torch.manual_seed(1)
    model = transformers.MistralForCausalLM(hf_cfg).eval()

    cfg = DecoderConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=1e-5, rope_theta=1_000_000.0,
        tie_word_embeddings=False, qk_norm=False,
    )
    params = map_decoder_weights(_to_numpy_state(model), cfg)
    _compare(cfg, params, model, seed=2)


def test_pixtral_vision_parity_vs_hf():
    """Pixtral ViT semantics: patch conv, 2D alternating-axis RoPE, pre-LN
    RMSNorm blocks, SiLU-gated MLP — vs HF PixtralVisionModel."""
    from flux2_tpu.models.text_encoders import pixtral as px

    hf_cfg = transformers.PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, patch_size=14, image_size=14 * 8,
        hidden_act="silu", rope_theta=10000.0,
    )
    torch.manual_seed(3)
    model = transformers.PixtralVisionModel(hf_cfg).eval()
    sd = _to_numpy_state(model)

    cfg = px.PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, patch_size=14, image_size=14 * 8,
    )
    p = cfg.patch_size
    blocks = []
    for i in range(cfg.num_hidden_layers):
        pre = f"transformer.layers.{i}."
        blocks.append({
            "attention_norm": jnp.asarray(sd[pre + "attention_norm.weight"]),
            "q_proj": jnp.asarray(sd[pre + "attention.q_proj.weight"].T),
            "k_proj": jnp.asarray(sd[pre + "attention.k_proj.weight"].T),
            "v_proj": jnp.asarray(sd[pre + "attention.v_proj.weight"].T),
            "o_proj": jnp.asarray(sd[pre + "attention.o_proj.weight"].T),
            "ffn_norm": jnp.asarray(sd[pre + "ffn_norm.weight"]),
            "gate_proj": jnp.asarray(sd[pre + "feed_forward.gate_proj.weight"].T),
            "up_proj": jnp.asarray(sd[pre + "feed_forward.up_proj.weight"].T),
            "down_proj": jnp.asarray(sd[pre + "feed_forward.down_proj.weight"].T),
        })
    # conv [h, 3, p, p] -> linear over our (ph, pw, c)-flattened patches
    conv = np.transpose(sd["patch_conv.weight"], (2, 3, 1, 0)).reshape(p * p * 3, -1)
    params = {
        "patch_conv": jnp.asarray(conv),
        "ln_pre": jnp.asarray(sd["ln_pre.weight"]),
        "blocks": blocks,
        "projector": None,  # not part of PixtralVisionModel
    }

    rng = np.random.default_rng(4)
    h = w = 14 * 4  # 4x4 patches
    pixels = rng.normal(size=(1, h, w, 3)).astype(np.float32)

    ours = np.asarray(px.encode_image(params, cfg, jnp.asarray(pixels)))
    with torch.no_grad():
        out = model(
            pixel_values=torch.tensor(np.transpose(pixels, (0, 3, 1, 2))),
            image_sizes=torch.tensor([[h, w]]),
        )
    theirs = out.last_hidden_state.to(torch.float32).numpy()
    d = np.abs(ours - theirs).max()
    assert d < 5e-5, d


def test_qwen3vl_mrope_parity_vs_hf():
    """Qwen3-VL text tower: per-section interleaved MRoPE ([6,5,5] ladder on
    head_dim 32) + QK-norm GQA — vs HF Qwen3VLTextModel (text-only ids)."""
    from flux2_tpu.models.text_encoders import qwen3vl as vl

    hf_cfg = transformers.Qwen3VLTextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, rms_norm_eps=1e-6, rope_theta=1_000_000.0,
        tie_word_embeddings=True,
        rope_scaling={"rope_type": "default", "mrope_section": [6, 5, 5], "mrope_interleaved": True},
    )
    torch.manual_seed(5)
    model = transformers.Qwen3VLTextModel(hf_cfg).eval()

    cfg = DecoderConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, rms_norm_eps=1e-6, rope_theta=1_000_000.0,
        tie_word_embeddings=True, qk_norm=True,
    )
    params = map_decoder_weights(_to_numpy_state(model), cfg)

    rng = np.random.default_rng(6)
    b, s = 1, 10
    ids = rng.integers(0, 256, size=(b, s))
    mask = np.ones((b, s), np.int64)

    # HF's text-only default expands position_ids to T=H=W=arange (NOT the
    # reference's H=W=0) — match it explicitly.
    ar = jnp.arange(s)
    pos = jnp.stack([ar, ar, ar])
    ours = np.asarray(
        vl.forward_hidden_states(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
            position_ids=pos, section=(6, 5, 5), hf_canonical=True,
        )
    )
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            output_hidden_states=True,
        )
    theirs = np.stack([h.to(torch.float32).numpy() for h in out.hidden_states])
    for li in range(cfg.num_hidden_layers):  # embeddings + all but final-normed last
        d = np.abs(ours[li] - theirs[li]).max()
        assert d < 5e-5, (li, d)


def test_gated_deltanet_parity_vs_hf():
    """Qwen3.5/Qwen3-Next Gated DeltaNet layer vs HF's torch reference
    (modeling_qwen3_next.Qwen3NextGatedDeltaNet): causal depthwise conv,
    l2-normed delta rule, gated RMSNorm — identical weights, both the
    sequential (S<=8) and chunk-parallel (S>8) paths."""
    from transformers.models.qwen3_next import modeling_qwen3_next as hf_mod

    from flux2_tpu.models.text_encoders import qwen35 as q35

    cfg = q35.TINY_QWEN35  # hk=2, hv=4, dk=16, dv=16, K=4, H=64
    hf_cfg = transformers.Qwen3NextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=4,
        num_attention_heads=2, num_key_value_heads=1, head_dim=32,
        linear_num_key_heads=cfg.linear_num_key_heads,
        linear_num_value_heads=cfg.linear_num_value_heads,
        linear_key_head_dim=cfg.linear_key_head_dim,
        linear_value_head_dim=cfg.linear_value_head_dim,
        linear_conv_kernel_dim=cfg.linear_conv_kernel_dim,
        full_attention_interval=4, rms_norm_eps=cfg.rms_norm_eps,
    )
    torch.manual_seed(7)
    layer = hf_mod.Qwen3NextGatedDeltaNet(hf_cfg, layer_idx=0).eval()
    # non-degenerate decay/step parameters
    with torch.no_grad():
        layer.A_log.uniform_(-2.0, 1.0)
        layer.dt_bias.uniform_(0.2, 1.5)
    sd = {k: v.detach().to(torch.float32).numpy() for k, v in layer.state_dict().items()}

    hk, hv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    rep = hv // hk
    blk = 2 * dk + 2 * rep * dv
    qkvz = sd["in_proj_qkvz.weight"]  # [(hk*blk), H]
    q_rows, k_rows, v_rows, z_rows = [], [], [], []
    for g in range(hk):
        base = g * blk
        q_rows.append(qkvz[base : base + dk])
        k_rows.append(qkvz[base + dk : base + 2 * dk])
        v_rows.append(qkvz[base + 2 * dk : base + 2 * dk + rep * dv])
        z_rows.append(qkvz[base + 2 * dk + rep * dv : base + blk])
    in_proj_qkv = np.concatenate(q_rows + k_rows + v_rows).T  # [H, conv_dim]
    in_proj_z = np.concatenate(z_rows).T
    ba = sd["in_proj_ba.weight"]  # [(hk*2*rep), H]
    b_rows, a_rows = [], []
    for g in range(hk):
        base = g * 2 * rep
        b_rows.append(ba[base : base + rep])
        a_rows.append(ba[base + rep : base + 2 * rep])
    lp = {
        "in_proj_qkv": jnp.asarray(in_proj_qkv),
        "in_proj_z": jnp.asarray(in_proj_z),
        "in_proj_b": jnp.asarray(np.concatenate(b_rows).T),
        "in_proj_a": jnp.asarray(np.concatenate(a_rows).T),
        "out_proj": jnp.asarray(sd["out_proj.weight"].T),
        "conv_kernel": jnp.asarray(np.transpose(sd["conv1d.weight"][:, 0, :])),  # [K, conv_dim]
        "norm_weight": jnp.asarray(sd["norm.weight"]),
        "a_log": jnp.asarray(sd["A_log"]),
        "dt_bias": jnp.asarray(sd["dt_bias"]),
    }

    rng = np.random.default_rng(8)
    for s in (6, 12):  # sequential and chunk-parallel paths
        x = rng.normal(size=(1, s, cfg.hidden_size)).astype(np.float32) * 0.5
        ours, _, _ = q35.gated_deltanet_forward(lp, cfg, jnp.asarray(x))
        with torch.no_grad():
            theirs = layer(torch.tensor(x)).to(torch.float32).numpy()
        d = np.abs(np.asarray(ours) - theirs).max()
        assert d < 1e-4, (s, d)


def test_gated_attention_parity_vs_hf():
    """Qwen3.5/Qwen3-Next output-gated attention (q_proj -> [q;gate] per head,
    QK head-dim RMSNorm, sigmoid gate on the attention output) vs HF's
    Qwen3NextAttention. Position ids zero -> rotation is identity in both
    (Qwen3.5's MRoPE vs Qwen3-Next's partial RoPE differ by design)."""
    from transformers.models.qwen3_next import modeling_qwen3_next as hf_mod

    from flux2_tpu.models.text_encoders import qwen35 as q35

    cfg = q35.TINY_QWEN35
    hf_cfg = transformers.Qwen3NextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=4,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
        partial_rotary_factor=cfg.partial_rotary_factor,
        rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_norm_eps,
        attention_bias=False, attention_dropout=0.0,
        linear_num_key_heads=cfg.linear_num_key_heads,
        linear_num_value_heads=cfg.linear_num_value_heads,
        linear_key_head_dim=cfg.linear_key_head_dim,
        linear_value_head_dim=cfg.linear_value_head_dim,
        full_attention_interval=4,
    )
    hf_cfg._attn_implementation = "eager"  # standalone module: no auto-dispatch
    torch.manual_seed(9)
    layer = hf_mod.Qwen3NextAttention(hf_cfg, layer_idx=3).eval()
    sd = {k: v.detach().to(torch.float32).numpy() for k, v in layer.state_dict().items()}

    lp = {
        "q_proj": jnp.asarray(sd["q_proj.weight"].T),
        "k_proj": jnp.asarray(sd["k_proj.weight"].T),
        "v_proj": jnp.asarray(sd["v_proj.weight"].T),
        "o_proj": jnp.asarray(sd["o_proj.weight"].T),
        # Qwen3NextRMSNorm is zero-centered (x * (1 + w)); fold the +1 as the
        # checkpoint mapper does
        "q_norm": jnp.asarray(1.0 + sd["q_norm.weight"]),
        "k_norm": jnp.asarray(1.0 + sd["k_norm.weight"]),
    }

    rng = np.random.default_rng(10)
    b, s = 1, 7
    x = rng.normal(size=(b, s, cfg.hidden_size)).astype(np.float32) * 0.5

    pos = jnp.zeros((3, b, s), jnp.int32)
    ours = np.asarray(q35.full_attention_forward(lp, cfg, jnp.asarray(x), pos))

    rot = cfg.rotary_dim
    cos = torch.ones(b, s, rot)
    sin = torch.zeros(b, s, rot)
    mask = torch.full((1, 1, s, s), float("-inf")).triu(1)
    with torch.no_grad():
        theirs, _ = layer(
            torch.tensor(x), position_embeddings=(cos, sin), attention_mask=mask
        )
    d = np.abs(ours - theirs.to(torch.float32).numpy()).max()
    assert d < 1e-5, d


def test_qwen35_full_model_parity_vs_hf():
    """Whole hybrid model through the real checkpoint path: HF
    Qwen3NextForCausalLM state_dict -> map_qwen35_weights -> our forward.
    Dense MLPs (mlp_only_layers = all); position_ids ZERO on both sides so
    the rotary conventions (Qwen3.5 MRoPE vs Qwen3-Next partial RoPE, which
    differ by design) drop out and everything else must match: embeddings,
    zero-centered norms, DeltaNet conv/recurrence, gated attention, MLPs,
    tied logits."""
    from flux2_tpu.io.weight_mapping import map_qwen35_weights
    from flux2_tpu.models.text_encoders import qwen35 as q35

    cfg = q35.TINY_QWEN35
    hf_cfg = transformers.Qwen3NextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
        partial_rotary_factor=cfg.partial_rotary_factor,
        rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_norm_eps,
        linear_num_key_heads=cfg.linear_num_key_heads,
        linear_num_value_heads=cfg.linear_num_value_heads,
        linear_key_head_dim=cfg.linear_key_head_dim,
        linear_value_head_dim=cfg.linear_value_head_dim,
        linear_conv_kernel_dim=cfg.linear_conv_kernel_dim,
        full_attention_interval=cfg.full_attention_interval,
        tie_word_embeddings=True, attention_bias=False, attention_dropout=0.0,
        mlp_only_layers=list(range(cfg.num_hidden_layers)),  # dense, no MoE
    )
    torch.manual_seed(11)
    model = transformers.Qwen3NextForCausalLM(hf_cfg).eval()
    with torch.no_grad():  # non-degenerate decay/step params
        for layer in model.model.layers:
            if hasattr(layer, "linear_attn"):
                layer.linear_attn.A_log.uniform_(-2.0, 1.0)
                layer.linear_attn.dt_bias.uniform_(0.2, 1.5)

    params = map_qwen35_weights(_to_numpy_state(model), cfg)

    rng = np.random.default_rng(12)
    b, s = 1, 12
    ids = rng.integers(0, cfg.vocab_size, size=(b, s))

    ours = np.asarray(
        q35.forward_logits(
            params, cfg, jnp.asarray(ids, jnp.int32),
            position_ids=jnp.zeros((3, b, s), jnp.int32),
        )
    )
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            position_ids=torch.zeros(b, s, dtype=torch.long),
        )
    theirs = out.logits.to(torch.float32).numpy()
    d = np.abs(ours - theirs).max()
    assert d < 5e-4, d


def test_mistral3_projector_parity_vs_hf():
    """Mistral Small 3.x multimodal projector (RMSNorm -> 2x2 patch merge ->
    linear -> exact GELU -> linear) vs HF Mistral3MultiModalProjector.

    HF's unfold-based merger flattens each 2x2 block channel-major
    (c*m*m + kh*m + kw); ours is spatial-major ((kh*m + kw)*d + c) — the
    merging weight's input columns permute accordingly at mapping time."""
    from transformers.models.mistral3 import modeling_mistral3 as hf_m3

    from flux2_tpu.models.text_encoders import pixtral as px

    d, m, text_h = 32, 2, 48
    vision_cfg = transformers.PixtralVisionConfig(
        hidden_size=d, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, patch_size=14, image_size=14 * 8,
    )
    text_cfg = transformers.MistralConfig(hidden_size=text_h, rms_norm_eps=1e-5)
    m3_cfg = transformers.Mistral3Config(
        vision_config=vision_cfg, text_config=text_cfg,
        spatial_merge_size=m, multimodal_projector_bias=False,
        projector_hidden_act="gelu", vision_feature_layer=-1,
    )
    torch.manual_seed(13)
    proj = hf_m3.Mistral3MultiModalProjector(m3_cfg).eval()
    sd = {k: v.detach().to(torch.float32).numpy() for k, v in proj.state_dict().items()}

    # permute merging weight columns: HF input idx c*m*m + kh*m + kw ->
    # ours (kh*m + kw)*d + c
    merge_hf = sd["patch_merger.merging_layer.weight"]  # [d, d*m*m]
    perm = np.empty(d * m * m, np.int64)
    for c in range(d):
        for kh in range(m):
            for kw in range(m):
                perm[(kh * m + kw) * d + c] = c * m * m + kh * m + kw
    merge_ours = merge_hf[:, perm].T  # [m*m*d, d]

    cfg = px.PixtralVisionConfig(
        hidden_size=d, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, patch_size=14, image_size=14 * 8, text_hidden_size=text_h,
        rms_norm_eps=1e-5, spatial_merge_size=m,
    )
    params = {
        "projector": {
            "norm": jnp.asarray(sd["norm.weight"]),
            "merge": jnp.asarray(merge_ours),
            "linear_1": jnp.asarray(sd["linear_1.weight"].T),
            "linear_2": jnp.asarray(sd["linear_2.weight"].T),
        }
    }

    rng = np.random.default_rng(14)
    gh, gw = 4, 6
    feats = rng.normal(size=(1, gh * gw, d)).astype(np.float32)

    ours = np.asarray(px.project_to_text_space(params, cfg, jnp.asarray(feats), gh, gw))
    with torch.no_grad():
        theirs = proj(
            torch.tensor(feats[0]),
            image_sizes=torch.tensor([[gh * cfg.patch_size, gw * cfg.patch_size]]),
        ).numpy()
    d_max = np.abs(ours[0] - theirs).max()
    assert d_max < 5e-6, d_max


def test_qwen35_vision_parity_vs_hf():
    """Qwen3.5/Qwen3-VL vision tower vs HF Qwen3VLVisionModel: Conv3d-as-
    linear patch embed, bilinear-interpolated learned positions (merge
    order), 2D half-split rotary, LayerNorm blocks with tanh-GELU MLPs,
    exact-GELU spatial merger."""
    from transformers.models.qwen3_vl import modeling_qwen3_vl as hf_vl

    from flux2_tpu.models.text_encoders import qwen35_vision as qv

    cfg = qv.Qwen35VisionConfig(
        depth=2, hidden_size=32, num_heads=2, intermediate_size=64,
        patch_size=16, temporal_patch_size=2, spatial_merge_size=2,
        num_position_embeddings=16, out_hidden_size=48,
    )
    from transformers.models.qwen3_vl.configuration_qwen3_vl import Qwen3VLVisionConfig

    hf_cfg = Qwen3VLVisionConfig(
        depth=2, hidden_size=32, num_heads=2, intermediate_size=64,
        patch_size=16, temporal_patch_size=2, spatial_merge_size=2,
        num_position_embeddings=16, out_hidden_size=48,
        hidden_act="gelu_pytorch_tanh", deepstack_visual_indexes=[],
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(15)
    model = hf_vl.Qwen3VLVisionModel(hf_cfg).eval()
    sd = {k: v.detach().to(torch.float32).numpy() for k, v in model.state_dict().items()}

    p, t = cfg.patch_size, cfg.temporal_patch_size
    # Conv3d [D, C, T, P, P] -> our (t, ph, pw, c)-flattened linear kernel
    conv = np.transpose(sd["patch_embed.proj.weight"], (2, 3, 4, 1, 0)).reshape(t * p * p * 3, -1)
    blocks = []
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        blocks.append({
            "norm1": {"scale": jnp.asarray(sd[pre + "norm1.weight"]), "bias": jnp.asarray(sd[pre + "norm1.bias"])},
            "norm2": {"scale": jnp.asarray(sd[pre + "norm2.weight"]), "bias": jnp.asarray(sd[pre + "norm2.bias"])},
            "qkv": {"kernel": jnp.asarray(sd[pre + "attn.qkv.weight"].T), "bias": jnp.asarray(sd[pre + "attn.qkv.bias"])},
            "proj": {"kernel": jnp.asarray(sd[pre + "attn.proj.weight"].T), "bias": jnp.asarray(sd[pre + "attn.proj.bias"])},
            "fc1": {"kernel": jnp.asarray(sd[pre + "mlp.linear_fc1.weight"].T), "bias": jnp.asarray(sd[pre + "mlp.linear_fc1.bias"])},
            "fc2": {"kernel": jnp.asarray(sd[pre + "mlp.linear_fc2.weight"].T), "bias": jnp.asarray(sd[pre + "mlp.linear_fc2.bias"])},
        })
    params = {
        "patch_embed": {"kernel": jnp.asarray(conv), "bias": jnp.asarray(sd["patch_embed.proj.bias"])},
        "pos_embed": jnp.asarray(sd["pos_embed.weight"]),
        "blocks": blocks,
        "merger": {
            "norm": {"scale": jnp.asarray(sd["merger.norm.weight"]), "bias": jnp.asarray(sd["merger.norm.bias"])},
            "fc1": {"kernel": jnp.asarray(sd["merger.linear_fc1.weight"].T), "bias": jnp.asarray(sd["merger.linear_fc1.bias"])},
            "fc2": {"kernel": jnp.asarray(sd["merger.linear_fc2.weight"].T), "bias": jnp.asarray(sd["merger.linear_fc2.bias"])},
        },
    }

    rng = np.random.default_rng(16)
    gh = gw = 4
    h, w = gh * p, gw * p
    pixels = rng.normal(size=(1, h, w, 3)).astype(np.float32) * 0.5

    ours = np.asarray(qv.encode_image(params, cfg, jnp.asarray(pixels)))

    # HF input: flattened patches in merge order, each (c, t, ph, pw)
    px4 = pixels.reshape(1, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)  # [1,gh,gw,p,p,c]
    px4 = px4.reshape(gh, gw, p, p, 3)
    merge = cfg.spatial_merge_size
    px4 = px4.reshape(gh // merge, merge, gw // merge, merge, p, p, 3).transpose(0, 2, 1, 3, 4, 5, 6)
    px4 = px4.reshape(gh * gw, p, p, 3)  # merge-order patches
    single = np.transpose(px4, (0, 3, 1, 2))  # (S, c, ph, pw)
    hf_patches = np.stack([single, single], axis=2).reshape(gh * gw, -1)  # (c, t, ph, pw) flat

    with torch.no_grad():
        theirs, deepstack = model(
            torch.tensor(hf_patches), grid_thw=torch.tensor([[1, gh, gw]])
        )
    theirs = theirs.to(torch.float32).numpy()
    assert deepstack == []
    d = np.abs(ours[0] - theirs).max()
    assert d < 1e-4, d


def test_tokenizer_adapter_with_real_hf_tokenizer(tmp_path):
    """HFTokenizerAdapter over a real (tiny, in-test) HF fast tokenizer with
    a Qwen-style chat template: template rendering, left-padding ids, decode."""
    tokenizers = pytest.importorskip("tokenizers")

    from flux2_tpu.models.text_encoders.extractor import prepare_input_ids
    from flux2_tpu.models.text_encoders.facade import HFTokenizerAdapter

    # tiny byte-level BPE trained on a few strings
    tok = tokenizers.Tokenizer(tokenizers.models.BPE(unk_token=None))
    tok.pre_tokenizer = tokenizers.pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = tokenizers.decoders.ByteLevel()
    trainer = tokenizers.trainers.BpeTrainer(
        vocab_size=512, special_tokens=["<|im_start|>", "<|im_end|>", "<|pad|>"],
        initial_alphabet=tokenizers.pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["a photo of a cat", "render the scene in watercolor", "system user assistant\n"], trainer
    )
    from transformers import PreTrainedTokenizerFast

    hf_tok = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<|pad|>", eos_token="<|im_end|>",
        chat_template=(
            "{% for message in messages %}<|im_start|>{{ message.role }}\n"
            "{{ message.content }}<|im_end|>\n{% endfor %}"
            "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
        ),
    )
    adapter = HFTokenizerAdapter(hf_tok)

    msgs = [{"role": "system", "content": "s"}, {"role": "user", "content": "a photo of a cat"}]
    ids = adapter.apply_chat_template(msgs)
    assert isinstance(ids, list) and len(ids) > 4
    # no generation prompt by default (the conditioning recipe's convention);
    # with it, the assistant header tokens are appended
    ids_gen = adapter.apply_chat_template(msgs, add_generation_prompt=True)
    assert len(ids_gen) > len(ids)
    assert ids_gen[: len(ids)] == ids

    # decode round-trips the visible text
    text = adapter.decode(adapter.encode("a photo of a cat"))
    assert text == "a photo of a cat"

    # the real conditioning input builder: chat template (no generation
    # prompt), truncate, LEFT-pad with mask
    batch, mask = prepare_input_ids(adapter, "a photo of a cat")  # default 512
    assert batch.shape == mask.shape == (1, 512)
    n_tok = int(mask.sum())
    assert n_tok > 4
    assert mask[0, : 512 - n_tok].sum() == 0  # left pad
    assert (batch[0, : 512 - n_tok] == adapter.pad_token_id).all()
    # the unpadded tail decodes back to text containing the prompt
    tail = [int(t) for t in batch[0, 512 - n_tok :]]
    assert "a photo of a cat" in adapter.decode(tail)
