"""CLI end-to-end with synthetic checkpoints on disk: the full slow path
(directory scan -> dialect mapping -> config.json parse -> generate ->
export-quantized -> prequantized fast path)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flux2_tpu.cli.main import main
from flux2_tpu.io import safetensors_io
from flux2_tpu.models.flux2 import config as cfg
from flux2_tpu.models.flux2 import transformer as tfm
from flux2_tpu.models.flux2 import vae as vae_mod
from tests.test_weight_mapping import make_diffusers_ckpt, CONFIG as T_CONFIG


@pytest.fixture(scope="module")
def model_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("models")

    # --- transformer checkpoint (diffusers dialect) + config.json ---
    tdir = base / "transformer"
    tdir.mkdir()
    params = tfm.init_params(jax.random.PRNGKey(0), T_CONFIG, dtype=jnp.float32)
    ckpt = make_diffusers_ckpt(params)
    safetensors_io.save_file({k: np.asarray(v, np.float32) for k, v in ckpt.items()}, str(tdir / "model.safetensors"))
    with open(tdir / "config.json", "w") as f:
        json.dump(
            {
                "num_layers": T_CONFIG.num_layers,
                "num_single_layers": T_CONFIG.num_single_layers,
                "num_attention_heads": T_CONFIG.num_attention_heads,
                "attention_head_dim": T_CONFIG.attention_head_dim,
                "joint_attention_dim": T_CONFIG.joint_attention_dim,
                "guidance_embeds": T_CONFIG.guidance_embeds,
            },
            f,
        )

    # --- VAE checkpoint (reuse the synthetic builder from the mapping tests) ---
    from tests.test_weight_mapping import test_vae_roundtrip  # noqa: F401  (builder inline below)

    vdir = base / "vae"
    vdir.mkdir()
    vconfig = vae_mod.VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1, norm_num_groups=4)
    vparams = vae_mod.init_params(jax.random.PRNGKey(1), vconfig)
    vweights = _vae_to_diffusers(vparams)
    safetensors_io.save_file(vweights, str(vdir / "diffusion_pytorch_model.safetensors"))
    with open(vdir / "config.json", "w") as f:
        json.dump(
            {
                "block_out_channels": list(vconfig.block_out_channels),
                "layers_per_block": 1,
                "norm_num_groups": 4,
                "latent_channels": 32,
            },
            f,
        )
    return str(tdir), str(vdir)


def _vae_to_diffusers(params):
    w = {}

    def put_conv(key, c):
        w[key + ".weight"] = np.ascontiguousarray(np.transpose(np.asarray(c["kernel"]), (3, 2, 0, 1)))
        w[key + ".bias"] = np.asarray(c["bias"])

    def put_gn(key, g):
        w[key + ".weight"] = np.asarray(g["scale"])
        w[key + ".bias"] = np.asarray(g["bias"])

    def put_dense(key, d):
        w[key + ".weight"] = np.asarray(d["kernel"]).T.copy()
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
        for n in ("to_q", "to_k", "to_v"):
            put_dense(f"{key}.{n}", a[n])
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
    dec = params["decoder"]
    put_conv("decoder.conv_in", dec["conv_in"])
    put_resnet("decoder.mid_block.resnets.0", dec["mid"]["resnet1"])
    put_attn("decoder.mid_block.attentions.0", dec["mid"]["attn"])
    put_resnet("decoder.mid_block.resnets.1", dec["mid"]["resnet2"])
    for i, blk in enumerate(dec["up_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            put_resnet(f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsample" in blk:
            put_conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", blk["upsample"])
    put_gn("decoder.conv_norm_out", dec["norm_out"])
    put_conv("decoder.conv_out", dec["conv_out"])
    put_conv("quant_conv", params["quant_conv"])
    put_conv("post_quant_conv", params["post_quant_conv"])
    w["bn.running_mean"] = np.asarray(params["bn"]["running_mean"])
    w["bn.running_var"] = np.asarray(params["bn"]["running_var"])
    return w


def test_cli_t2i_from_disk(model_dirs, tmp_path, monkeypatch):
    """t2i loads real safetensors from disk and produces a PNG."""
    tdir, vdir = model_dirs
    out = str(tmp_path / "out.png")
    # embeddings come from the text encoder normally; with no encoder the
    # pipeline raises — patch in random embeddings through --random-init's
    # helper by monkeypatching _embeddings_for to use the loaded config.
    import flux2_tpu.cli.main as cli

    monkeypatch.setattr(
        cli,
        "_embeddings_for",
        lambda pipe, args: jax.random.normal(
            jax.random.PRNGKey(0), (1, 8, pipe.transformer_config.joint_attention_dim), jnp.bfloat16
        ),
    )
    main([
        "t2i", "--model", "klein-4b", "--transformer-dir", tdir, "--vae-dir", vdir,
        "--width", "64", "--height", "64", "--steps", "1", "-o", out,
    ])
    assert os.path.exists(out)
    from PIL import Image

    with Image.open(out) as im:
        assert im.size == (64, 64)


def test_cli_export_quantized_then_fast_path(model_dirs, tmp_path, monkeypatch):
    """export-quantized writes a prequantized checkpoint; a following load
    takes the fast path (asserted via the integrity-validated file)."""
    tdir, vdir = model_dirs
    import flux2_tpu.cli.main as cli

    main(["export-quantized", "--model", "klein-4b", "--quantization", "qint8", "--transformer-dir", tdir])
    from flux2_tpu.io import checkpoints

    path = checkpoints.prequantized_path(tdir, "qint8")
    assert os.path.exists(path)
    loaded, meta = checkpoints.load_prequantized(path, expected_source_dir=tdir)
    assert meta["format"] == "qint8"
    from flux2_tpu.ops import quant

    assert quant.is_quantized(loaded["double_blocks"]["to_q"])

    # and the t2i path picks it up
    monkeypatch.setattr(
        cli,
        "_embeddings_for",
        lambda pipe, args: jax.random.normal(
            jax.random.PRNGKey(0), (1, 8, pipe.transformer_config.joint_attention_dim), jnp.bfloat16
        ),
    )
    out = str(tmp_path / "q.png")
    main([
        "t2i", "--model", "klein-4b", "--transformer-dir", tdir, "--vae-dir", vdir,
        "--quantization", "qint8", "--width", "64", "--height", "64", "--steps", "1", "-o", out,
    ])
    assert os.path.exists(out)


def test_cli_inpaint_from_disk(model_dirs, tmp_path, monkeypatch):
    """inpaint CLI end-to-end from disk checkpoints."""
    from PIL import Image

    tdir, vdir = model_dirs
    img_path = str(tmp_path / "src.png")
    mask_path = str(tmp_path / "mask.png")
    Image.fromarray(np.full((64, 64, 3), 128, np.uint8)).save(img_path)
    m = np.zeros((64, 64), np.uint8)
    m[:, 32:] = 255
    Image.fromarray(m, mode="L").save(mask_path)

    import flux2_tpu.cli.main as cli

    monkeypatch.setattr(
        cli, "_embeddings_for",
        lambda pipe, args: jax.random.normal(
            jax.random.PRNGKey(0), (1, 8, pipe.transformer_config.joint_attention_dim), jnp.bfloat16
        ),
    )
    out = str(tmp_path / "inpainted.png")
    main([
        "inpaint", "--model", "klein-4b", "--transformer-dir", tdir, "--vae-dir", vdir,
        "--image", img_path, "--mask", mask_path, "--steps", "1", "-o", out,
    ])
    with Image.open(out) as im:
        assert im.size == (64, 64)


def test_cli_outpaint_from_disk(model_dirs, tmp_path, monkeypatch):
    from PIL import Image

    tdir, vdir = model_dirs
    img_path = str(tmp_path / "src.png")
    Image.fromarray(np.full((64, 64, 3), 100, np.uint8)).save(img_path)

    import flux2_tpu.cli.main as cli

    monkeypatch.setattr(
        cli, "_embeddings_for",
        lambda pipe, args: jax.random.normal(
            jax.random.PRNGKey(0), (1, 8, pipe.transformer_config.joint_attention_dim), jnp.bfloat16
        ),
    )
    out = str(tmp_path / "outpainted.png")
    main([
        "outpaint", "--model", "klein-4b", "--transformer-dir", tdir, "--vae-dir", vdir,
        "--image", img_path, "--right", "32", "--steps", "1", "-o", out,
    ])
    with Image.open(out) as im:
        assert im.size == (96, 64)
