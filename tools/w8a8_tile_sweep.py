"""Full-model A/B of W8A8 kernel tile defaults on the real chip.

The round-2 pure-GEMM sweep (docs/knowledge/decisions/quantization-formats.md)
measured bm=1024/bn=1024/bk=512 at 193 T/s vs the shipped 512/1024/1024 at
181 T/s, but the shipped default was chosen for M-padding behaviour at DiT
sequence lengths. This settles it at the FULL-MODEL level: Klein-4B 1024px
W8A8 chained steps per tile config (fresh trace per config so the patched
kernel defaults bind).

Usage: python tools/w8a8_tile_sweep.py   (needs the TPU free; ~5 min warm)
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from flux2_tpu.ops import quant_kernels  # noqa: E402


def main():
    from flux2_tpu.models.flux2 import config as cfg

    params_q = bench._random_w8a8_params(cfg.KLEIN_4B)

    configs = [
        (512, 1024, 1024),   # shipped default
        (1024, 1024, 512),   # pure-GEMM sweep winner
        (1024, 512, 1024),
        (512, 512, 1024),
        (256, 1024, 1024),
        (1024, 1024, 1024),  # may fail VMEM
    ]
    results = {}
    orig = quant_kernels.w8a8_matmul
    for bm, bn, bk in configs:
        name = f"bm{bm}_bn{bn}_bk{bk}"
        quant_kernels.w8a8_matmul = functools.partial(orig, bm=bm, bn=bn, bk=bk)
        try:
            dt = bench._steps_per_sec(cfg.KLEIN_4B, params_q)
            results[name] = round(dt, 4)
            print(f"{name}: {dt:.4f} s/step", flush=True)
        except Exception as e:  # VMEM OOM etc.
            results[name] = f"error: {type(e).__name__}: {str(e)[:120]}"
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        finally:
            quant_kernels.w8a8_matmul = orig
    print("SWEEP " + json.dumps(results))


if __name__ == "__main__":
    main()
