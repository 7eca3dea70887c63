"""Trainable subject segmenter: a tiny U-Net behind subject_mask's hook.

The reference gets real foreground segmentation from Apple Vision
(``Flux2SubjectMask.swift:26`` — VNGenerateForegroundInstanceMaskRequest),
which has no TPU equivalent. Round 2 substituted a border-statistics
saliency heuristic; this module replaces it as the DEFAULT with a ~0.6M-
parameter U-Net trained on synthetic subject-on-background composites
(tools/train_segmenter.py), weights committed in-repo. The heuristic stays
as the no-weights fallback.

Design: fixed 256x256 working resolution (one compiled program for any
input size — host-side PIL resize at the edges), conv encoder/decoder with
GroupNorm + silu and skip concats, single-logit head. All convs NHWC/HWIO
(MXU-friendly), forward is one jit.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flux2_tpu.utils.rngs import key_iter

WORK_RES = 256
CHANNELS = (24, 48, 96, 160)  # stem + 3 downsamples
WEIGHTS_FILE = os.path.join(os.path.dirname(__file__), "segmenter_weights.safetensors")

Params = Dict[str, dict]


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout):
    scale = (2.0 / (kh * kw * cin)) ** 0.5
    return {
        "kernel": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * scale,
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def _gn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def init_params(key: jax.Array) -> Params:
    keys = key_iter(key, 64)
    p: Params = {"stem": _conv_init(next(keys), 3, 3, 3, CHANNELS[0])}
    for i in range(1, len(CHANNELS)):
        p[f"down{i}"] = {
            "conv": _conv_init(next(keys), 3, 3, CHANNELS[i - 1], CHANNELS[i]),
            "norm": _gn_init(CHANNELS[i]),
            "conv2": _conv_init(next(keys), 3, 3, CHANNELS[i], CHANNELS[i]),
            "norm2": _gn_init(CHANNELS[i]),
        }
    for i in range(len(CHANNELS) - 1, 0, -1):
        cin = CHANNELS[i] + CHANNELS[i - 1]  # upsampled + skip
        p[f"up{i}"] = {
            "conv": _conv_init(next(keys), 3, 3, cin, CHANNELS[i - 1]),
            "norm": _gn_init(CHANNELS[i - 1]),
            "conv2": _conv_init(next(keys), 3, 3, CHANNELS[i - 1], CHANNELS[i - 1]),
            "norm2": _gn_init(CHANNELS[i - 1]),
        }
    p["head"] = _conv_init(next(keys), 1, 1, CHANNELS[0], 1)
    return p


def _conv(p, x, stride=1):
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["bias"]


def _gn(p, x, groups=8):
    b, h, w, c = x.shape
    g = min(groups, c)
    xr = x.reshape(b, h, w, g, c // g)
    mean = xr.mean(axis=(1, 2, 4), keepdims=True)
    var = xr.var(axis=(1, 2, 4), keepdims=True)
    xr = (xr - mean) * jax.lax.rsqrt(var + 1e-5)
    return xr.reshape(b, h, w, c) * p["scale"] + p["bias"]


def _block(p, x, stride):
    x = jax.nn.silu(_gn(p["norm"], _conv(p["conv"], x, stride=stride)))
    return jax.nn.silu(_gn(p["norm2"], _conv(p["conv2"], x)))


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")


def forward(params: Params, img: jnp.ndarray) -> jnp.ndarray:
    """[B, 256, 256, 3] in [0,1] -> foreground logits [B, 256, 256]."""
    x = img * 2.0 - 1.0
    skips = [jax.nn.silu(_conv(params["stem"], x))]
    for i in range(1, len(CHANNELS)):
        skips.append(_block(params[f"down{i}"], skips[-1], stride=2))
    x = skips[-1]
    for i in range(len(CHANNELS) - 1, 0, -1):
        x = jnp.concatenate([_upsample2(x), skips[i - 1]], axis=-1)
        x = _block(params[f"up{i}"], x, stride=1)
    return _conv(params["head"], x)[..., 0]


@jax.jit
def _predict(params: Params, img: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(forward(params, img))


class Segmenter:
    """Callable [H, W, 3] float image -> [H, W] foreground probability —
    plugs straight into subject_mask(segmenter=...)."""

    def __init__(self, params: Params):
        self.params = params

    def __call__(self, image: np.ndarray) -> np.ndarray:
        h, w = image.shape[:2]
        small = _resize_np(image, WORK_RES, WORK_RES)
        prob = np.asarray(_predict(self.params, jnp.asarray(small[None], jnp.float32)))[0]
        return _resize_np(prob[..., None], h, w)[..., 0]


def load_default() -> Optional[Segmenter]:
    """The committed trained weights, or None (callers fall back to the
    saliency heuristic)."""
    if not os.path.exists(WEIGHTS_FILE):
        return None
    from flux2_tpu.io import safetensors_io

    flat = safetensors_io.load_file(WEIGHTS_FILE)
    params: Params = {}
    for k, v in flat.items():
        node = params
        parts = k.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(v)
    return Segmenter(params)


def save_weights(params: Params, path: str = WEIGHTS_FILE) -> None:
    from flux2_tpu.io import safetensors_io

    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v, np.float32)

    walk(params, "")
    safetensors_io.save_file(flat, path)


def _resize_np(image: np.ndarray, h: int, w: int) -> np.ndarray:
    if image.shape[0] == h and image.shape[1] == w:
        return np.asarray(image, np.float32)
    try:
        from PIL import Image

        mode_in = np.clip(image, 0.0, 1.0)
        if image.shape[-1] == 1:
            im = Image.fromarray((mode_in[..., 0] * 255).astype(np.uint8), "L")
            return (np.asarray(im.resize((w, h), Image.BILINEAR), np.float32) / 255.0)[..., None]
        im = Image.fromarray((mode_in * 255).astype(np.uint8))
        return np.asarray(im.resize((w, h), Image.BILINEAR), np.float32) / 255.0
    except ImportError:  # jax fallback
        return np.asarray(jax.image.resize(jnp.asarray(image), (h, w, image.shape[-1]), "bilinear"))


# ---------------------------------------------------------------------------
# Synthetic composite data (training + evaluation fixtures)
# ---------------------------------------------------------------------------


def synth_composite(rng: np.random.RandomState, size: int = WORK_RES):
    """(image [S,S,3], mask [S,S]) — random subject on a busy background.

    Backgrounds mix gradients, low-frequency noise, and clutter patches
    (exactly what defeats border-statistics saliency); subjects are unions
    of ellipses/rectangles with their own texture, random size/position,
    sometimes touching the border.
    """
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size

    # background: gradient + band pattern + clutter rectangles
    c0, c1 = rng.rand(3), rng.rand(3)
    ang = rng.rand() * 2 * np.pi
    t = (np.cos(ang) * xx + np.sin(ang) * yy)[..., None]
    bg = c0 * (1 - t) + c1 * t
    if rng.rand() < 0.7:
        freq = rng.uniform(4, 24)
        bands = 0.5 + 0.5 * np.sin(freq * (np.cos(ang) * yy - np.sin(ang) * xx) * 2 * np.pi)
        bg = bg * (0.75 + 0.25 * bands[..., None])
    for _ in range(rng.randint(0, 6)):  # clutter
        ph, pw = rng.randint(size // 16, size // 3, size=2)
        py, px = rng.randint(0, size - ph), rng.randint(0, size - pw)
        bg[py:py + ph, px:px + pw] = rng.rand(3) * 0.9 + 0.05
    bg += rng.randn(size, size, 3) * 0.02

    # subject: union of 1-3 ellipses/rects around a center
    mask = np.zeros((size, size), np.float32)
    cy, cx = rng.uniform(0.25, 0.75, size=2) * size
    for _ in range(rng.randint(1, 4)):
        oy, ox = rng.randn(2) * size * 0.08
        ry, rx = rng.uniform(size * 0.08, size * 0.28, size=2)
        if rng.rand() < 0.3:  # rectangle part
            y0, y1 = int(max(0, cy + oy - ry)), int(min(size, cy + oy + ry))
            x0, x1 = int(max(0, cx + ox - rx)), int(min(size, cx + ox + rx))
            mask[y0:y1, x0:x1] = 1.0
        else:
            e = ((yy * size - cy - oy) / ry) ** 2 + ((xx * size - cx - ox) / rx) ** 2
            mask = np.maximum(mask, (e <= 1.0).astype(np.float32))

    subj = rng.rand(3) * 0.9 + 0.05
    tex = 0.5 + 0.5 * np.sin(
        rng.uniform(6, 30) * (xx + yy) * np.pi + rng.rand() * 6
    )
    subject = subj * (0.8 + 0.2 * tex[..., None]) + rng.randn(size, size, 3) * 0.02
    img = np.where(mask[..., None] > 0.5, subject, bg)
    return np.clip(img, 0.0, 1.0).astype(np.float32), mask


def iou(pred: np.ndarray, target: np.ndarray, threshold: float = 0.5) -> float:
    p = pred >= threshold
    t = target >= 0.5
    inter = float(np.logical_and(p, t).sum())
    union = float(np.logical_or(p, t).sum())
    return inter / union if union else 1.0
