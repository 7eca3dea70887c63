"""Checkpoint dialect mapping tests: synthetic BFL and Diffusers checkpoints
built from one parameter set must both map back to identical pytrees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.io import weight_mapping as wm
from flux2_tpu.models.flux2 import config as cfg
from flux2_tpu.models.flux2 import transformer as tfm
from flux2_tpu.models.flux2 import vae as vae_mod
from flux2_tpu.models.text_encoders import config as tc
from flux2_tpu.models.text_encoders import decoder as dec

CONFIG = cfg.Flux2TransformerConfig(
    num_layers=2, num_single_layers=2, num_attention_heads=2,
    attention_head_dim=128, joint_attention_dim=96, guidance_embeds=True,
)


def _tp(x):
    return np.asarray(x).T  # JAX [in,out] -> torch [out,in]


def make_diffusers_ckpt(p):
    w = {}
    w["x_embedder.weight"] = _tp(p["x_embedder"]["kernel"])
    w["context_embedder.weight"] = _tp(p["context_embedder"]["kernel"])
    w["time_text_embed.timestep_embedder.linear_1.weight"] = _tp(p["time_embed"]["linear1"])
    w["time_text_embed.timestep_embedder.linear_2.weight"] = _tp(p["time_embed"]["linear2"])
    w["time_text_embed.guidance_embedder.linear_1.weight"] = _tp(p["guidance_embed"]["linear1"])
    w["time_text_embed.guidance_embedder.linear_2.weight"] = _tp(p["guidance_embed"]["linear2"])
    w["double_stream_modulation_img.linear.weight"] = _tp(p["double_mod_img"]["kernel"])
    w["double_stream_modulation_txt.linear.weight"] = _tp(p["double_mod_txt"]["kernel"])
    w["single_stream_modulation.linear.weight"] = _tp(p["single_mod"]["kernel"])
    w["norm_out.linear.weight"] = _tp(p["norm_out"]["kernel"])
    w["proj_out.weight"] = _tp(p["proj_out"]["kernel"])
    db = p["double_blocks"]
    names = {
        "to_q": "attn.to_q", "to_k": "attn.to_k", "to_v": "attn.to_v",
        "to_out": "attn.to_out.0", "add_q": "attn.add_q_proj", "add_k": "attn.add_k_proj",
        "add_v": "attn.add_v_proj", "add_out": "attn.to_add_out",
        "ff_in": "ff.linear_in", "ff_out": "ff.linear_out",
        "ff_ctx_in": "ff_context.linear_in", "ff_ctx_out": "ff_context.linear_out",
    }
    for i in range(CONFIG.num_layers):
        for leaf, name in names.items():
            w[f"transformer_blocks.{i}.{name}.weight"] = _tp(db[leaf][i])
        for leaf, name in {"norm_q": "norm_q", "norm_k": "norm_k",
                           "norm_added_q": "norm_added_q", "norm_added_k": "norm_added_k"}.items():
            w[f"transformer_blocks.{i}.attn.{leaf}.weight"] = np.asarray(db[leaf][i])
    sb = p["single_blocks"]
    for i in range(CONFIG.num_single_layers):
        fused_in = np.concatenate(
            [_tp(sb["to_q"][i]), _tp(sb["to_k"][i]), _tp(sb["to_v"][i]),
             _tp(sb["mlp_gate"][i]), _tp(sb["mlp_up"][i])], axis=0)
        w[f"single_transformer_blocks.{i}.attn.to_qkv_mlp_proj.weight"] = fused_in
        fused_out = np.concatenate([_tp(sb["out_attn"][i]), _tp(sb["out_mlp"][i])], axis=1)
        w[f"single_transformer_blocks.{i}.attn.to_out.weight"] = fused_out
        w[f"single_transformer_blocks.{i}.attn.norm_q.weight"] = np.asarray(sb["norm_q"][i])
        w[f"single_transformer_blocks.{i}.attn.norm_k.weight"] = np.asarray(sb["norm_k"][i])
    return w


def make_bfl_ckpt(p):
    w = {}
    w["img_in.weight"] = _tp(p["x_embedder"]["kernel"])
    w["txt_in.weight"] = _tp(p["context_embedder"]["kernel"])
    w["time_in.in_layer.weight"] = _tp(p["time_embed"]["linear1"])
    w["time_in.out_layer.weight"] = _tp(p["time_embed"]["linear2"])
    w["guidance_in.in_layer.weight"] = _tp(p["guidance_embed"]["linear1"])
    w["guidance_in.out_layer.weight"] = _tp(p["guidance_embed"]["linear2"])
    w["double_stream_modulation_img.lin.weight"] = _tp(p["double_mod_img"]["kernel"])
    w["double_stream_modulation_txt.lin.weight"] = _tp(p["double_mod_txt"]["kernel"])
    w["single_stream_modulation.lin.weight"] = _tp(p["single_mod"]["kernel"])
    # BFL stores [shift|scale] rows — inverse of the loader's swap.
    no = _tp(p["norm_out"]["kernel"])
    d = no.shape[0] // 2
    w["final_layer.adaLN_modulation.1.weight"] = np.concatenate([no[d:], no[:d]], axis=0)
    w["final_layer.linear.weight"] = _tp(p["proj_out"]["kernel"])
    db = p["double_blocks"]
    for i in range(CONFIG.num_layers):
        w[f"double_blocks.{i}.img_attn.qkv.weight"] = np.concatenate(
            [_tp(db["to_q"][i]), _tp(db["to_k"][i]), _tp(db["to_v"][i])], axis=0)
        w[f"double_blocks.{i}.txt_attn.qkv.weight"] = np.concatenate(
            [_tp(db["add_q"][i]), _tp(db["add_k"][i]), _tp(db["add_v"][i])], axis=0)
        w[f"double_blocks.{i}.img_attn.proj.weight"] = _tp(db["to_out"][i])
        w[f"double_blocks.{i}.txt_attn.proj.weight"] = _tp(db["add_out"][i])
        w[f"double_blocks.{i}.img_attn.norm.query_norm.scale"] = np.asarray(db["norm_q"][i])
        w[f"double_blocks.{i}.img_attn.norm.key_norm.scale"] = np.asarray(db["norm_k"][i])
        w[f"double_blocks.{i}.txt_attn.norm.query_norm.scale"] = np.asarray(db["norm_added_q"][i])
        w[f"double_blocks.{i}.txt_attn.norm.key_norm.scale"] = np.asarray(db["norm_added_k"][i])
        w[f"double_blocks.{i}.img_mlp.0.weight"] = _tp(db["ff_in"][i])
        w[f"double_blocks.{i}.img_mlp.2.weight"] = _tp(db["ff_out"][i])
        w[f"double_blocks.{i}.txt_mlp.0.weight"] = _tp(db["ff_ctx_in"][i])
        w[f"double_blocks.{i}.txt_mlp.2.weight"] = _tp(db["ff_ctx_out"][i])
    sb = p["single_blocks"]
    for i in range(CONFIG.num_single_layers):
        w[f"single_blocks.{i}.linear1.weight"] = np.concatenate(
            [_tp(sb["to_q"][i]), _tp(sb["to_k"][i]), _tp(sb["to_v"][i]),
             _tp(sb["mlp_gate"][i]), _tp(sb["mlp_up"][i])], axis=0)
        w[f"single_blocks.{i}.linear2.weight"] = np.concatenate(
            [_tp(sb["out_attn"][i]), _tp(sb["out_mlp"][i])], axis=1)
        w[f"single_blocks.{i}.norm.query_norm.scale"] = np.asarray(sb["norm_q"][i])
        w[f"single_blocks.{i}.norm.key_norm.scale"] = np.asarray(sb["norm_k"][i])
    return w


@pytest.fixture(scope="module")
def ref_params():
    return tfm.init_params(jax.random.PRNGKey(0), CONFIG, dtype=jnp.float32)


def _assert_trees_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(fb[path]), atol=1e-6, err_msg=str(path)
        )


@pytest.mark.slow
def test_diffusers_roundtrip(ref_params):
    ckpt = make_diffusers_ckpt(ref_params)
    assert not wm.is_bfl_format(ckpt)
    mapped = wm.map_transformer_weights(ckpt, CONFIG)
    _assert_trees_equal(ref_params, mapped)


def test_bfl_roundtrip(ref_params):
    ckpt = make_bfl_ckpt(ref_params)
    assert wm.is_bfl_format(ckpt)
    mapped = wm.map_transformer_weights(ckpt, CONFIG)
    _assert_trees_equal(ref_params, mapped)


def test_both_dialects_agree(ref_params):
    a = wm.map_transformer_weights(make_bfl_ckpt(ref_params), CONFIG)
    b = wm.map_transformer_weights(make_diffusers_ckpt(ref_params), CONFIG)
    _assert_trees_equal(a, b)


def test_quanto_dequantization():
    w = {
        "x.weight._data": np.array([[2, 4]], dtype=np.int8),
        "x.weight._scale": np.array([[0.5]], dtype=np.float32),
        "y.weight": np.array([1.0], dtype=np.float32),
    }
    out = wm.dequantize_quanto(w)
    np.testing.assert_allclose(out["x.weight"], [[1.0, 2.0]])
    assert "x.weight._scale" not in out
    assert "y.weight" in out


def test_missing_key_raises(ref_params):
    ckpt = make_diffusers_ckpt(ref_params)
    del ckpt["transformer_blocks.0.attn.to_q.weight"]
    with pytest.raises(KeyError):
        wm.map_transformer_weights(ckpt, CONFIG)


@pytest.mark.slow
def test_vae_roundtrip():
    config = vae_mod.TINY_VAE
    params = vae_mod.init_params(jax.random.PRNGKey(1), config)

    # Build a synthetic diffusers VAE checkpoint from the pytree.
    w = {}

    def put_conv(key, c):
        w[key + ".weight"] = np.ascontiguousarray(np.transpose(np.asarray(c["kernel"]), (3, 2, 0, 1)))
        w[key + ".bias"] = np.asarray(c["bias"])

    def put_gn(key, g):
        w[key + ".weight"] = np.asarray(g["scale"])
        w[key + ".bias"] = np.asarray(g["bias"])

    def put_dense(key, d):
        w[key + ".weight"] = _tp(d["kernel"])
        w[key + ".bias"] = np.asarray(d["bias"])

    def put_resnet(key, r):
        put_gn(key + ".norm1", r["norm1"])
        put_conv(key + ".conv1", r["conv1"])
        put_gn(key + ".norm2", r["norm2"])
        put_conv(key + ".conv2", r["conv2"])
        if "conv_shortcut" in r:
            put_conv(key + ".conv_shortcut", r["conv_shortcut"])

    def put_attn(key, a):
        put_gn(key + ".group_norm", a["group_norm"])
        put_dense(key + ".to_q", a["to_q"])
        put_dense(key + ".to_k", a["to_k"])
        put_dense(key + ".to_v", a["to_v"])
        put_dense(key + ".to_out.0", a["to_out"])

    enc = params["encoder"]
    put_conv("encoder.conv_in", enc["conv_in"])
    for i, blk in enumerate(enc["down_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            put_resnet(f"encoder.down_blocks.{i}.resnets.{j}", r)
        if "downsample" in blk:
            put_conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", blk["downsample"])
    put_resnet("encoder.mid_block.resnets.0", enc["mid"]["resnet1"])
    put_attn("encoder.mid_block.attentions.0", enc["mid"]["attn"])
    put_resnet("encoder.mid_block.resnets.1", enc["mid"]["resnet2"])
    put_gn("encoder.conv_norm_out", enc["norm_out"])
    put_conv("encoder.conv_out", enc["conv_out"])

    decd = params["decoder"]
    put_conv("decoder.conv_in", decd["conv_in"])
    put_resnet("decoder.mid_block.resnets.0", decd["mid"]["resnet1"])
    put_attn("decoder.mid_block.attentions.0", decd["mid"]["attn"])
    put_resnet("decoder.mid_block.resnets.1", decd["mid"]["resnet2"])
    for i, blk in enumerate(decd["up_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            put_resnet(f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsample" in blk:
            put_conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", blk["upsample"])
    put_gn("decoder.conv_norm_out", decd["norm_out"])
    put_conv("decoder.conv_out", decd["conv_out"])
    put_conv("quant_conv", params["quant_conv"])
    put_conv("post_quant_conv", params["post_quant_conv"])
    w["bn.running_mean"] = np.asarray(params["bn"]["running_mean"])
    w["bn.running_var"] = np.asarray(params["bn"]["running_var"])

    mapped = wm.map_vae_weights(w, config)
    _assert_trees_equal(params, mapped)


def test_decoder_roundtrip():
    cfgd = tc.TINY_DECODER
    params = dec.init_params(jax.random.PRNGKey(2), cfgd, dtype=jnp.float32)
    w = {"model.embed_tokens.weight": np.asarray(params["embed_tokens"]),
         "model.norm.weight": np.asarray(params["final_norm"])}
    L = params["layers"]
    for i in range(cfgd.num_hidden_layers):
        w[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(L["input_norm"][i])
        w[f"model.layers.{i}.post_attention_layernorm.weight"] = np.asarray(L["post_attn_norm"][i])
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            w[f"model.layers.{i}.self_attn.{name}.weight"] = _tp(L[name][i])
        w[f"model.layers.{i}.self_attn.q_norm.weight"] = np.asarray(L["q_norm"][i])
        w[f"model.layers.{i}.self_attn.k_norm.weight"] = np.asarray(L["k_norm"][i])
        for name in ("gate_proj", "up_proj", "down_proj"):
            w[f"model.layers.{i}.mlp.{name}.weight"] = _tp(L[name][i])
    mapped = wm.map_decoder_weights(w, cfgd)
    _assert_trees_equal(params, mapped)
