"""flux-encoders CLI — parity with ``Sources/FluxEncodersCLI``.

Subcommands: generate, chat (interactive, streaming), embed (export
conditioning embeddings), upsample, models.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional

import numpy as np


def _load_encoder(args):
    from flux2_tpu.models.text_encoders.facade import shared

    if args.encoder_dir:
        if args.family == "mistral":
            return shared.load_mistral(args.encoder_dir, args.tokenizer_dir)
        return shared.load_qwen3(args.encoder_dir, args.tokenizer_dir, size=args.family.split("-")[-1])
    raise SystemExit("pass --encoder-dir pointing at downloaded weights")


def cmd_generate(args):
    from flux2_tpu.models.text_encoders.facade import shared
    from flux2_tpu.models.text_encoders.generation import GenerateParameters

    enc = _load_encoder(args)
    out = shared.generate_text(
        args.prompt, enc.name,
        params=GenerateParameters(max_tokens=args.max_tokens, temperature=args.temperature),
        seed=args.seed,
    )
    print(out)


def cmd_chat(args):
    from flux2_tpu.models.text_encoders.facade import shared
    from flux2_tpu.models.text_encoders.generation import GenerateParameters

    enc = _load_encoder(args)
    messages = []
    print("interactive chat — empty line to exit")
    while True:
        try:
            user = input("> ").strip()
        except EOFError:
            break
        if not user:
            break
        messages.append({"role": "user", "content": user})
        reply = shared.chat(
            messages, enc.name,
            params=GenerateParameters(max_tokens=args.max_tokens, temperature=args.temperature),
            seed=args.seed,
            on_token=lambda piece: print(piece, end="", flush=True),
            enable_thinking=getattr(args, "thinking", False),
        )
        print()
        messages.append({"role": "assistant", "content": reply})


def cmd_embed(args):
    from flux2_tpu.models.text_encoders.facade import shared

    enc = _load_encoder(args)
    emb = np.asarray(enc.extractor(args.prompt))
    np.save(args.output, emb)
    print(json.dumps({"shape": list(emb.shape), "dtype": str(emb.dtype), "output": args.output}))


def cmd_upsample(args):
    from flux2_tpu.models.text_encoders.facade import shared

    enc = _load_encoder(args)
    mode = "upsampling_i2i" if args.i2i else "upsampling_t2i"
    print(shared.upsample_prompt(args.prompt, enc.name, mode=mode, seed=args.seed))


def cmd_vision(args):
    """VLM image analysis (FluxEncodersCLI.swift:12-15 `vision`): image path
    + prompt -> description through the Mistral+Pixtral VLM."""
    from flux2_tpu.models.text_encoders.facade import shared
    from PIL import Image

    with Image.open(args.image) as im:
        image = np.asarray(im.convert("RGB"), np.float32) / 255.0
    if not shared.is_vlm_loaded:
        if not args.encoder_dir:
            raise SystemExit(
                "pass --encoder-dir pointing at a VLM checkpoint (Mistral-Small "
                "w/ Pixtral tower, or Qwen3.5-VL for --image2 comparison)"
            )
        from flux2_tpu.models.text_encoders.facade import detect_vlm_family

        if detect_vlm_family(args.encoder_dir) == "qwen35":
            shared.load_qwen35_vlm(args.encoder_dir, args.tokenizer_dir)
        else:
            shared.load_mistral_vlm(args.encoder_dir, args.tokenizer_dir)
    if getattr(args, "image2", None):
        import json as _json

        with Image.open(args.image2) as im2:
            generated = np.asarray(im2.convert("RGB"), np.float32) / 255.0
        print(_json.dumps(shared.compare_images_for_flux(image, generated), indent=2))
        return
    print(shared.analyze_image(image, args.prompt, seed=args.seed))


def cmd_compare(args):
    """Compare two encoders' embeddings on the same prompt
    (CompareEncoders parity)."""
    import json as _json

    from flux2_tpu.models.text_encoders.facade import compare_embeddings, shared

    a = _load_encoder(args)
    args_b = argparse.Namespace(**vars(args))
    args_b.family, args_b.encoder_dir = args.family_b, args.encoder_dir_b
    b = _load_encoder(args_b)
    stats = compare_embeddings(a.extractor(args.prompt), b.extractor(args.prompt))
    print(_json.dumps(stats, indent=2))


def cmd_models(args):
    from flux2_tpu.io import registry

    for name, spec in registry.TEXT_ENCODER_REPOS.items():
        found = registry.find_model_path(spec)
        print(f"  {name:<20} {spec.repo_id:<50} "
              f"{'[downloaded]' if found else '[not downloaded]'}{' [gated]' if spec.gated else ''}")


def _common(p):
    p.add_argument("--family", default="qwen3-4b", choices=["mistral", "qwen3-4b", "qwen3-8b"])
    p.add_argument("--encoder-dir")
    p.add_argument("--tokenizer-dir")
    p.add_argument("--max-tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=0)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="flux-encoders", description="FLUX.2 text-encoder tools")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("generate", help="one-shot text generation")
    _common(p)
    p.add_argument("--prompt", required=True)
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("chat", help="interactive streaming chat")
    _common(p)
    p.add_argument(
        "--thinking", action="store_true",
        help="enable Qwen3 thinking mode (default off: /no_think appended, "
        "direct responses — TestQwen3.swift --no-thinking inverse)",
    )
    p.set_defaults(fn=cmd_chat)

    p = sub.add_parser("embed", help="export FLUX conditioning embeddings (.npy)")
    _common(p)
    p.add_argument("--prompt", required=True)
    p.add_argument("-o", "--output", default="embeddings.npy")
    p.set_defaults(fn=cmd_embed)

    p = sub.add_parser("upsample", help="BFL prompt upsampling")
    _common(p)
    p.add_argument("--prompt", required=True)
    p.add_argument("--i2i", action="store_true", help="image-editing instruction mode")
    p.set_defaults(fn=cmd_upsample)

    p = sub.add_parser("vision", help="VLM image analysis (image + prompt -> description)")
    _common(p)
    p.add_argument("--image", required=True, help="image path to analyze")
    p.add_argument(
        "--image2",
        help="second image: compare --image (reference) vs --image2 (generated) "
        "with FLUX.2 LoRA-evaluation criteria (0-100 scene/style JSON)",
    )
    p.add_argument("--prompt", default="Describe this image in detail.")
    p.set_defaults(fn=cmd_vision)

    p = sub.add_parser("compare", help="compare two encoders' embeddings")
    _common(p)
    p.add_argument("--prompt", required=True)
    p.add_argument("--family-b", default="qwen3-4b", choices=["mistral", "qwen3-4b", "qwen3-8b"])
    p.add_argument("--encoder-dir-b")
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser("models", help="list encoder repos + download status")
    p.set_defaults(fn=cmd_models)

    args = parser.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
