"""Train the subject segmenter U-Net on synthetic composites and save the
weights committed at flux2_tpu/chains/segmenter_weights.safetensors.

Run (any backend; a few minutes on one v5e chip):
    python tools/train_segmenter.py --steps 1500 --batch 16

Loss: BCE + soft-Dice on 256x256 composites from
chains.segmenter.synth_composite (training seeds 0..9999; evaluation
fixtures in tests/test_segmenter.py use seeds >= 10_000 — held out).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flux2_tpu.chains import segmenter as seg


def make_batch(rng: np.random.RandomState, batch: int):
    imgs, masks = zip(*(seg.synth_composite(rng) for _ in range(batch)))
    return jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(masks))


def loss_fn(params, imgs, masks):
    logits = seg.forward(params, imgs)
    bce = optax.sigmoid_binary_cross_entropy(logits, masks).mean()
    prob = jax.nn.sigmoid(logits)
    inter = (prob * masks).sum(axis=(1, 2))
    dice = 1.0 - (2 * inter + 1.0) / (prob.sum(axis=(1, 2)) + masks.sum(axis=(1, 2)) + 1.0)
    return bce + dice.mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=seg.WEIGHTS_FILE)
    args = ap.parse_args()

    params = seg.init_params(jax.random.PRNGKey(args.seed))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"segmenter params: {n_params/1e6:.2f}M")

    opt = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps, 0.05))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, imgs, masks):
        loss, grads = jax.value_and_grad(loss_fn)(params, imgs, masks)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    for i in range(1, args.steps + 1):
        imgs, masks = make_batch(rng, args.batch)
        params, opt_state, loss = step(params, opt_state, imgs, masks)
        if i % 100 == 0 or i == 1:
            print(f"step {i}/{args.steps} loss {float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

    # quick held-out IoU report (same seeds as the test fixtures)
    model = seg.Segmenter(params)
    eval_rng = np.random.RandomState(10_000)
    ious_m, ious_h = [], []
    from flux2_tpu.chains.subject_mask import saliency_foreground

    for _ in range(16):
        img, mask = seg.synth_composite(eval_rng)
        ious_m.append(seg.iou(model(img), mask))
        ious_h.append(seg.iou(saliency_foreground(img), mask))
    print(f"held-out IoU: model {np.mean(ious_m):.3f} vs heuristic {np.mean(ious_h):.3f}")

    seg.save_weights(params, args.out)
    print(f"weights -> {args.out}")


if __name__ == "__main__":
    main()
