"""A/B the VV forward at move-program shapes (VERDICT r1 item 4 lever b).

Times, loop-amortized on the current backend (run on the real chip):
  flax      — XLA's generic conv lowering (the production evaluator path)
  im2col    — ops/vv_forward.vv_forward_xla_im2col (one matmul per layer)
at n = batch*7 boards, f32 and bf16 variants of the flax path.

Usage: python scripts/ab_forward.py [--batch 256] [--iters 50]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.ops.vv_forward import vv_forward_xla_im2col
from tetris_mcts_tpu.train.trainer import VVModel


def timed(fn, *args, iters):
    """Wall time per call of jitted `fn`, amortized over a chained loop
    (standalone timings through the tunnel are meaningless — CLAUDE.md)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    n = args.batch * 7
    model = VVModel(seed=0)
    rng = np.random.RandomState(0)
    packed = jnp.asarray(rng.randint(0, 2**20, (n, 20)).astype(np.uint32))
    imgs = jax.jit(engine.unpack_obs)(packed)[..., None].astype(jnp.float32)

    flax_f32 = jax.jit(lambda p, u, x: model._infer(p, u, x))
    bf16_apply = model.apply_fn(jnp.bfloat16)
    flax_bf16 = jax.jit(bf16_apply)
    im2col = jax.jit(vv_forward_xla_im2col)

    rows = {
        "flax_f32_ms": timed(flax_f32, model.params, model.ubound, imgs,
                             iters=args.iters) * 1e3,
        "flax_bf16_ms": timed(flax_bf16, model.params, model.ubound, imgs,
                              iters=args.iters) * 1e3,
        "im2col_f32_ms": timed(im2col, model.params, model.ubound,
                               model.lbound, imgs, iters=args.iters) * 1e3,
        "n_boards": n,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in rows.items()}))


if __name__ == "__main__":
    main()
