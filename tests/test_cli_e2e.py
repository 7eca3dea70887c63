"""CLI end-to-end with synthetic checkpoints on disk: the full slow path
(directory scan -> dialect mapping -> config.json parse -> text-encoder
load through the real facade -> generate -> export-quantized ->
prequantized fast path). No embedding monkeypatches: prompts flow through
a tiny-but-real encoder checkpoint + HF tokenizer on disk."""

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

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the fast tier


@pytest.fixture(scope="module")
def encoder_dir(tmp_path_factory):
    """Tiny-but-real Qwen3-style encoder checkpoint: HF-layout safetensors,
    config.json, and a real fast tokenizer with a chat template — exercises
    the exact files `flux2 t2i --encoder-dir` reads."""
    tokenizers = pytest.importorskip("tokenizers")
    from transformers import PreTrainedTokenizerFast

    base = tmp_path_factory.mktemp("encoder")

    tok = tokenizers.Tokenizer(tokenizers.models.BPE(unk_token=None))
    tok.pre_tokenizer = tokenizers.pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = tokenizers.decoders.ByteLevel()
    trainer = tokenizers.trainers.BpeTrainer(
        vocab_size=512, special_tokens=["<|im_start|>", "<|im_end|>", "<|pad|>"],
        initial_alphabet=tokenizers.pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["a photo of a cat", "structured responses about images", "system user assistant\n"],
        trainer,
    )
    hf_tok = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<|pad|>", eos_token="<|im_end|>",
        chat_template=(
            "{% for message in messages %}<|im_start|>{{ message.role }}\n"
            "{{ message.content }}<|im_end|>\n{% endfor %}"
            "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
        ),
    )
    hf_tok.save_pretrained(str(base))

    # Klein conditioning needs hidden layers [9, 18, 27], so >= 28 layers;
    # keep every dim tiny. 3 x hidden 32 = the DiT test config's joint 96.
    n_layers, hidden, inter, heads, kv_heads, head_dim = 28, 32, 64, 2, 1, 16
    vocab = max(600, len(hf_tok) + 1)
    rng = np.random.default_rng(7)

    def lin(o, i):
        return (rng.standard_normal((o, i)) * 0.02).astype(np.float32)

    w = {"model.embed_tokens.weight": lin(vocab, hidden), "model.norm.weight": np.ones(hidden, np.float32)}
    for i in range(n_layers):
        pre = f"model.layers.{i}."
        w[pre + "input_layernorm.weight"] = np.ones(hidden, np.float32)
        w[pre + "self_attn.q_proj.weight"] = lin(heads * head_dim, hidden)
        w[pre + "self_attn.k_proj.weight"] = lin(kv_heads * head_dim, hidden)
        w[pre + "self_attn.v_proj.weight"] = lin(kv_heads * head_dim, hidden)
        w[pre + "self_attn.o_proj.weight"] = lin(hidden, heads * head_dim)
        w[pre + "self_attn.q_norm.weight"] = np.ones(head_dim, np.float32)
        w[pre + "self_attn.k_norm.weight"] = np.ones(head_dim, np.float32)
        w[pre + "post_attention_layernorm.weight"] = np.ones(hidden, np.float32)
        w[pre + "mlp.gate_proj.weight"] = lin(inter, hidden)
        w[pre + "mlp.up_proj.weight"] = lin(inter, hidden)
        w[pre + "mlp.down_proj.weight"] = lin(hidden, inter)
    safetensors_io.save_file(w, str(base / "model.safetensors"))
    with open(base / "config.json", "w") as f:
        json.dump(
            {
                "vocab_size": vocab, "hidden_size": hidden, "intermediate_size": inter,
                "num_hidden_layers": n_layers, "num_attention_heads": heads,
                "num_key_value_heads": kv_heads, "head_dim": head_dim,
                "rms_norm_eps": 1e-6, "rope_theta": 1e6, "tie_word_embeddings": True,
            },
            f,
        )
    return str(base)


@pytest.fixture(autouse=True)
def _fresh_facade():
    """Each test attaches encoders through the module-level facade; keep it
    clean across tests."""
    from flux2_tpu.models.text_encoders import facade

    facade.shared.unload_all()
    facade.shared.unload_vlm()
    yield
    facade.shared.unload_all()
    facade.shared.unload_vlm()


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


def test_cli_t2i_from_disk(model_dirs, encoder_dir, tmp_path):
    """t2i loads transformer + VAE + text encoder from disk and encodes the
    prompt through the real facade path — no embedding patching."""
    tdir, vdir = model_dirs
    out = str(tmp_path / "out.png")
    main([
        "t2i", "--model", "klein-4b", "--transformer-dir", tdir, "--vae-dir", vdir,
        "--encoder-dir", encoder_dir, "--prompt", "a photo of a cat",
        "--width", "64", "--height", "64", "--steps", "1", "-o", out,
    ])
    assert os.path.exists(out)
    from PIL import Image

    with Image.open(out) as im:
        assert im.size == (64, 64)


def test_cli_t2i_missing_encoder_fails_clearly(model_dirs, tmp_path, monkeypatch):
    """Without encoder weights the CLI exits with an actionable message
    instead of dying inside encode_prompt."""
    tdir, vdir = model_dirs
    monkeypatch.setenv("FLUX2_MODELS_DIR", str(tmp_path / "nothing"))
    monkeypatch.setenv("HF_HOME", str(tmp_path / "nohf"))
    with pytest.raises(SystemExit, match="text encoder"):
        main([
            "t2i", "--model", "klein-4b", "--transformer-dir", tdir, "--vae-dir", vdir,
            "--width", "64", "--height", "64", "--steps", "1", "-o", str(tmp_path / "x.png"),
        ])


def test_cli_export_quantized_then_fast_path(model_dirs, encoder_dir, tmp_path):
    """export-quantized writes a prequantized checkpoint; a following load
    takes the fast path (asserted via the integrity-validated file)."""
    tdir, vdir = model_dirs

    main(["export-quantized", "--model", "klein-4b", "--quantization", "qint8", "--transformer-dir", tdir])
    from flux2_tpu.io import checkpoints

    path = checkpoints.prequantized_path(tdir, "qint8")
    assert os.path.exists(path)
    loaded, meta = checkpoints.load_prequantized(path, expected_source_dir=tdir)
    assert meta["format"] == "qint8"
    from flux2_tpu.ops import quant

    assert quant.is_quantized(loaded["double_blocks"]["to_q"])

    # and the t2i path picks it up
    out = str(tmp_path / "q.png")
    main([
        "t2i", "--model", "klein-4b", "--transformer-dir", tdir, "--vae-dir", vdir,
        "--encoder-dir", encoder_dir, "--prompt", "a photo of a cat",
        "--quantization", "qint8", "--width", "64", "--height", "64", "--steps", "1", "-o", out,
    ])
    assert os.path.exists(out)


def test_cli_export_quantized_lora_baked(model_dirs, tmp_path):
    """export-quantized --lora bakes the merged LoRA and tags the
    checkpoint (Flux2Pipeline.swift:758-826)."""
    tdir, vdir = model_dirs
    d = T_CONFIG.inner_dim
    rng = np.random.RandomState(3)
    w = {
        "transformer.transformer_blocks.0.attn.to_q.lora_A.weight": rng.randn(4, d).astype(np.float32),
        "transformer.transformer_blocks.0.attn.to_q.lora_B.weight": rng.randn(d, 4).astype(np.float32),
    }
    lora_path = str(tmp_path / "style.safetensors")
    safetensors_io.save_file(w, lora_path, metadata={"alpha": "4"})

    main([
        "export-quantized", "--model", "klein-4b", "--quantization", "qint8",
        "--transformer-dir", tdir, "--lora", f"{lora_path}:0.5",
    ])
    from flux2_tpu.io import checkpoints

    path = checkpoints.prequantized_path(tdir, "qint8")
    loaded, meta = checkpoints.load_prequantized(path, expected_source_dir=tdir)
    assert meta["lora_baked"] == "1"
    # baked weights differ from a plain quantize of the source
    from flux2_tpu.ops import quant

    raw = checkpoints.load_weights_dir(tdir)
    from flux2_tpu.io import weight_mapping

    base = weight_mapping.map_transformer_weights(raw, T_CONFIG, dtype=np.float32)
    plain = quant.quantize(jnp.asarray(base["double_blocks"]["to_q"], jnp.bfloat16), "qint8")
    assert not np.array_equal(np.asarray(loaded["double_blocks"]["to_q"].q), np.asarray(plain.q))
    os.remove(path)  # don't leak the baked ckpt into other tests' fast path


def test_cli_inpaint_from_disk(model_dirs, encoder_dir, tmp_path):
    """inpaint CLI end-to-end from disk checkpoints."""
    from PIL import Image

    tdir, vdir = model_dirs
    img_path = str(tmp_path / "src.png")
    mask_path = str(tmp_path / "mask.png")
    Image.fromarray(np.full((64, 64, 3), 128, np.uint8)).save(img_path)
    m = np.zeros((64, 64), np.uint8)
    m[:, 32:] = 255
    Image.fromarray(m, mode="L").save(mask_path)

    out = str(tmp_path / "inpainted.png")
    main([
        "inpaint", "--model", "klein-4b", "--transformer-dir", tdir, "--vae-dir", vdir,
        "--encoder-dir", encoder_dir, "--prompt", "a photo of a cat",
        "--image", img_path, "--mask", mask_path, "--steps", "1", "-o", out,
    ])
    with Image.open(out) as im:
        assert im.size == (64, 64)


def test_cli_outpaint_from_disk(model_dirs, encoder_dir, tmp_path):
    from PIL import Image

    tdir, vdir = model_dirs
    img_path = str(tmp_path / "src.png")
    Image.fromarray(np.full((64, 64, 3), 100, np.uint8)).save(img_path)

    out = str(tmp_path / "outpainted.png")
    main([
        "outpaint", "--model", "klein-4b", "--transformer-dir", tdir, "--vae-dir", vdir,
        "--encoder-dir", encoder_dir, "--prompt", "a photo of a cat",
        "--image", img_path, "--right", "32", "--steps", "1", "-o", out,
    ])
    with Image.open(out) as im:
        assert im.size == (96, 64)
