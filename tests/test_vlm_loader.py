"""Hermetic Qwen3.5-VL loader test: a tiny-but-real HF-layout VL checkpoint
on disk (model.language_model.* + model.visual.* keys, config.json with
text_config/vision_config, real fast tokenizer) drives
``facade.load_qwen35_vlm`` end-to-end — the loading path the reference's
bundled VLM uses (FluxTextEncoders.loadQwen35VLM), previously only
constructible in-process."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def qwen35_vl_dir(tmp_path_factory):
    from transformers.models.qwen3_vl import modeling_qwen3_vl as hf_vl
    from transformers.models.qwen3_vl.configuration_qwen3_vl import Qwen3VLVisionConfig

    from flux2_tpu.io import safetensors_io

    base = tmp_path_factory.mktemp("qwen35vl")

    # --- tokenizer (real fast tokenizer + Qwen-style chat template) ---
    tokenizers = pytest.importorskip("tokenizers")
    from transformers import PreTrainedTokenizerFast

    tok = tokenizers.Tokenizer(tokenizers.models.BPE(unk_token=None))
    tok.pre_tokenizer = tokenizers.pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = tokenizers.decoders.ByteLevel()
    trainer = tokenizers.trainers.BpeTrainer(
        vocab_size=500, special_tokens=["<|im_start|>", "<|im_end|>", "<|pad|>"],
        initial_alphabet=tokenizers.pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(["compare these two images", "scene style score"], trainer)
    hf_tok = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<|pad|>", eos_token="<|im_end|>",
        chat_template=(
            "{% for message in messages %}<|im_start|>{{ message.role }}\n"
            "{{ message.content }}<|im_end|>\n{% endfor %}"
            "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
        ),
    )
    hf_tok.save_pretrained(str(base))

    vocab = 600  # > tokenizer vocab; image token uses the top id
    image_token_id = vocab - 1

    # --- text side: real HF Qwen3Next tiny model (dense MLPs) ---
    text_cfg_d = {
        "model_type": "qwen3_next", "vocab_size": vocab, "hidden_size": 64,
        "intermediate_size": 96, "num_hidden_layers": 4,
        "num_attention_heads": 2, "num_key_value_heads": 1, "head_dim": 32,
        "partial_rotary_factor": 0.25,
        "rope_scaling": {"mrope_section": [2, 1, 1]},
        "linear_num_key_heads": 2, "linear_num_value_heads": 4,
        "linear_key_head_dim": 16, "linear_value_head_dim": 16,
        "linear_conv_kernel_dim": 4, "full_attention_interval": 4,
    }
    hf_cfg = transformers.Qwen3NextConfig(
        vocab_size=vocab, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=2, num_key_value_heads=1,
        head_dim=32, partial_rotary_factor=0.25,
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, full_attention_interval=4,
        tie_word_embeddings=True, attention_bias=False, attention_dropout=0.0,
        mlp_only_layers=list(range(4)),
    )
    torch.manual_seed(31)
    lm = transformers.Qwen3NextForCausalLM(hf_cfg).eval()
    with torch.no_grad():
        for layer in lm.model.layers:
            if hasattr(layer, "linear_attn"):
                layer.linear_attn.A_log.uniform_(-2.0, 1.0)
                layer.linear_attn.dt_bias.uniform_(0.2, 1.5)

    # --- vision side: real HF Qwen3-VL vision tower ---
    vis_cfg_d = {
        "depth": 1, "hidden_size": 32, "num_heads": 2, "intermediate_size": 64,
        "patch_size": 16, "temporal_patch_size": 2, "spatial_merge_size": 2,
        "num_position_embeddings": 16, "out_hidden_size": 64,
    }
    vis_hf = Qwen3VLVisionConfig(
        **vis_cfg_d, hidden_act="gelu_pytorch_tanh", deepstack_visual_indexes=[]
    )
    vis_hf._attn_implementation = "eager"
    torch.manual_seed(32)
    vm = hf_vl.Qwen3VLVisionModel(vis_hf).eval()

    # --- write the VL-nested checkpoint layout ---
    tensors = {}
    for k, v in lm.state_dict().items():
        if k == "lm_head.weight":
            continue  # tied
        kk = "model.language_model." + k[len("model."):] if k.startswith("model.") else k
        tensors[kk] = v.detach().to(torch.float32).numpy()
    for k, v in vm.state_dict().items():
        tensors["model.visual." + k] = v.detach().to(torch.float32).numpy()
    safetensors_io.save_file(tensors, os.path.join(str(base), "model.safetensors"))

    with open(os.path.join(str(base), "config.json"), "w") as f:
        json.dump({
            "model_type": "qwen3_vl",
            "image_token_id": image_token_id,
            "text_config": text_cfg_d,
            "vision_config": vis_cfg_d,
        }, f)
    return str(base)


def test_load_qwen35_vlm_end_to_end(qwen35_vl_dir):
    from flux2_tpu.models.text_encoders import facade

    facade.shared.unload_vlm()
    try:
        svc = facade.shared.load_qwen35_vlm(qwen35_vl_dir)
        assert facade.shared.is_vlm_loaded
        # image token id threaded from the top-level config
        assert svc.vision_config.image_token_id == 599

        # text-only chat through the real tokenizer + mapped weights
        out = svc.chat("you are terse", "hello", max_tokens=3)
        assert isinstance(out, str)

        # image analysis + two-image comparison end-to-end
        rng = np.random.RandomState(5)
        ref = rng.rand(64, 64, 3).astype(np.float32)
        gen = rng.rand(64, 64, 3).astype(np.float32)
        result = facade.shared.compare_images_for_flux(ref, gen)
        assert set(result) == {"scene_score", "scene_reason", "style_score", "style_reason"}
    finally:
        facade.shared.unload_vlm()


def test_vision_cli_autodetects_qwen35(qwen35_vl_dir, tmp_path, capsys):
    """flux-encoders vision --image2 auto-loads the Qwen3.5 VLM from a
    qwen3_vl checkpoint dir and prints the comparison JSON."""
    from PIL import Image

    from flux2_tpu.cli.encoders import main as enc_main
    from flux2_tpu.models.text_encoders import facade

    facade.shared.unload_vlm()
    a, b = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    rng = np.random.RandomState(6)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(a)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(b)
    try:
        enc_main(["vision", "--image", a, "--image2", b, "--encoder-dir", qwen35_vl_dir])
        out = capsys.readouterr().out
        parsed = json.loads(out[out.index("{"):])
        assert "scene_score" in parsed and "style_score" in parsed
    finally:
        facade.shared.unload_vlm()


def test_load_qwen35_vlm_replaces_wrong_family_vlm(tmp_path):
    """A resident non-Qwen3.5 VLM (e.g. Mistral/Pixtral) must NOT be handed
    back from load_qwen35_vlm: the caller asked for Qwen3.5 by name, so the
    loader proceeds to load (and here fails on the bogus dir) instead of
    returning the wrong-family service."""
    from flux2_tpu.models.text_encoders import facade

    facade.shared.unload_vlm()
    facade.shared._vlm = object()  # stand-in for a loaded Mistral VLM
    try:
        with pytest.raises((FileNotFoundError, OSError)):
            facade.shared.load_qwen35_vlm(str(tmp_path / "nope"))
    finally:
        facade.shared.unload_vlm()
