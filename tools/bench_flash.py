"""Isolated flash-attention kernel benchmark (long-sequence regime).

Measures the Klein-4B 2048px attention shape (S=16896 joint tokens, 24
heads, hd=128, bf16) plus the 1024px shape, reporting achieved TFLOP/s vs
the v5e bf16 peak (~197 T/s). Round-2 baseline at S=16896: 31.3 ms = 112 T/s.

Run: python tools/bench_flash.py [--block-k N] [--block-q N]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from flux2_tpu.ops.flash_attention import flash_attention


def bench(s, h=24, d=128, block_q=512, block_k=None, iters=20, bounded=True):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (1, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, h, s, d), jnp.bfloat16)
    fn = jax.jit(lambda q, k, v: flash_attention(q, k, v, block_q=block_q, block_k=block_k,
                                                 bounded_logits=bounded))
    fn(q, k, v).block_until_ready()

    # tunnel-safe timing: a full throwaway loop first (the axon tunnel's
    # first dispatch burst of a fresh executable is pathologically slow),
    # then the measured loop with one tiny host transfer at the end.
    def loop(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(q, k, v)
        _ = jax.device_get(out[0, 0, 0, :1])
        return (time.perf_counter() - t0) / n

    loop(3)
    dt = loop(iters)
    flops = 4.0 * s * s * d * h  # QK^T + PV
    return dt, flops / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-q", type=int, default=512)
    ap.add_argument("--block-k", type=int, default=None)
    ap.add_argument("--seqs", default="4608,16896")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    for s in (int(x) for x in args.seqs.split(",")):
        dt, tps = bench(s, block_q=args.block_q, block_k=args.block_k, iters=args.iters)
        print(f"S={s:6d} bq={args.block_q} bk={args.block_k or 'auto'}: "
              f"{dt*1e3:7.2f} ms  {tps:6.1f} T/s  ({tps/197*100:.0f}% peak)", flush=True)


if __name__ == "__main__":
    main()
