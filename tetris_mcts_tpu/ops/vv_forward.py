"""Fused VV-net forward as a Pallas TPU kernel.

The value/variance net (models/nets.py VVNet: 3x conv(32, 3x3, VALID) +
FC256 -> 2 sigmoid outputs) is evaluated B×7 times per MCTS simulation on
20x10 boards. XLA's generic conv lowering is weak at these shapes (1 input
channel, 10-wide images pad 12.8x on the lane dim), and the boards arrive
bit-packed from the search (one uint32 per row). This kernel fuses:

    bit-unpack (packed u32[20] -> ±1 image)
    -> conv1 as 9 shifted broadcast-MACs (1 input channel: VPU)
    -> conv2/conv3 as im2col matmuls (K = 9*32 = 288: MXU)
    -> FC256 matmul + ReLU -> FC2 + sigmoid * ubound + lbound

into one VMEM-resident program over a grid of board blocks. Math matches
`VVNet.apply` up to TPU default matmul precision (~1e-3 relative; tests
assert agreement).

**Measured verdict (TPU v5e, 1792 boards, loop-amortized): flax conv path
0.51 ms, this kernel 3.85 ms, the same fusion as plain jnp 4.9 ms.** The
hypothesis that XLA's small-channel conv lowering is the bottleneck was
WRONG — XLA does fine; mosaic's restrictions (no lane-changing reshapes, no
multi-axis contractions, no concat of offset slices) force the convs and
FC1 into K=32 mini-matmuls that underutilize the MXU, and the 32-channel
f32 intermediates pad 4x on lanes, capping the block size at 16 boards.
The kernel is therefore NOT the default evaluator path (`use_pallas=False`
everywhere it matters); it stays in-tree as the framework's worked example
of a Pallas TPU kernel with validation, and as the starting point if a
future net uses >=128 channels where these constraints disappear.

Falls back to a pure-jnp implementation of the same fusion on non-TPU
backends (pallas interpret mode is too slow for the CPU test suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BOARD_H, BOARD_W = 20, 10
TILE = 16  # boards per grid step (32-lane-padded f32 intermediates: VMEM-bound)


def unpack_pm1(packed):
    """uint32[..., 20] -> float32[..., 20, 10] with {0, 1 locked, -1 piece}
    (bits 0-9 locked row, 10-19 piece row; piece wins where both set —
    engine.pack_obs / unpack_obs contract)."""
    cols = jnp.arange(BOARD_W, dtype=jnp.uint32)
    # uint32 -> int32 -> float32: mosaic has no direct u32->f32 cast
    locked = ((packed[..., None] >> cols) & 1).astype(jnp.int32).astype(
        jnp.float32
    )
    piece = ((packed[..., None] >> (cols + jnp.uint32(10))) & 1).astype(
        jnp.int32
    ).astype(jnp.float32)
    return locked * (1.0 - piece) - piece


def _conv1_9shift(img, k1, b1):
    """(n, 20, 10) x (3, 3, 32) -> (n, 18, 8, 32): single input channel, so
    nine shifted broadcast multiply-adds on the VPU beat an MXU matmul with
    K=9."""
    out = jnp.zeros(img.shape[:1] + (18, 8, 32), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = img[:, dy:dy + 18, dx:dx + 8]
            out = out + patch[..., None] * k1[dy, dx]
    return jax.nn.relu(out + b1)


def _conv_im2col(x, k, b, H, W):
    """(n, H+2, W+2, 32) x (9, 32, 32) -> (n, H, W, 32) as nine shifted
    (n*H*W, 32) @ (32, 32) MXU matmuls (mosaic supports neither the im2col
    concat of offset slices nor lane-changing reshapes, so the conv is a sum
    of per-tap matmuls; k arrives pre-split per tap)."""
    n = x.shape[0]
    acc = None
    for i, (dy, dx) in enumerate(
        (dy, dx) for dy in range(3) for dx in range(3)
    ):
        xs = x[:, dy:dy + H, dx:dx + W, :].reshape(n * H * W, 32)
        m = jnp.dot(xs, k[i], preferred_element_type=jnp.float32)
        acc = m if acc is None else acc + m
    return jax.nn.relu(acc.reshape(n, H, W, 32) + b)


def _forward_block(packed, k1, b1, k2, b2, k3, b3, w_fc, b_fc, w_out, b_out,
                   ubound, lbound):
    """The fused math on one block of boards (pure jnp — used both inside
    the pallas kernel body and as the non-TPU fallback)."""
    img = unpack_pm1(packed)                       # (n, 20, 10)
    x = _conv1_9shift(img, k1, b1)                 # (n, 18, 8, 32)
    x = _conv_im2col(x, k2, b2, 16, 6)             # (n, 16, 6, 32)
    x = _conv_im2col(x, k3, b3, 14, 4)             # (n, 14, 4, 32)
    # FC1: mosaic supports neither lane-changing reshapes, multi-axis
    # contractions, nor concatenation of offset slices, so the
    # (n, 1792) @ (1792, 256) product is unrolled per spatial position:
    # 56 K=32 matmuls of x[:, y, j, :] against w_fc chunk (y*4+j)
    # — exactly rows p*32:(p+1)*32 of the flax row-major flatten
    # (w_fc arrives pre-reshaped to (56, 32, 256), see extract_vv_weights).
    acc = jnp.broadcast_to(b_fc, (x.shape[0], b_fc.shape[-1]))
    for y in range(14):
        for j in range(4):
            acc = acc + jnp.dot(
                x[:, y, j, :], w_fc[y * 4 + j],
                preferred_element_type=jnp.float32,
            )
    x = jax.nn.relu(acc)
    out = jnp.dot(x, w_out, preferred_element_type=jnp.float32) + b_out
    out = jax.nn.sigmoid(out) * ubound + lbound
    return out                                      # (n, 2)


def _kernel(packed_ref, k1_ref, b1_ref, k2_ref, b2_ref, k3_ref, b3_ref,
            wfc_ref, bfc_ref, wout_ref, bout_ref, bounds_ref, out_ref):
    out_ref[:] = _forward_block(
        packed_ref[:],
        k1_ref[:], b1_ref[:], k2_ref[:], b2_ref[:], k3_ref[:], b3_ref[:],
        wfc_ref[:], bfc_ref[:], wout_ref[:], bout_ref[:],
        bounds_ref[0], bounds_ref[1],
    )


def extract_vv_weights(params):
    """Pull the VVNet weight arrays out of a flax params tree (float32)."""
    p = params["params"]
    get = lambda name, leaf: jnp.asarray(p[name][leaf], jnp.float32)
    return (
        get("conv1", "kernel").reshape(3, 3, 32), get("conv1", "bias"),
        get("conv2", "kernel").reshape(9, 32, 32), get("conv2", "bias"),
        get("conv3", "kernel").reshape(9, 32, 32), get("conv3", "bias"),
        # (1792, 256) -> (56, 32, 256): row-major K-chunk split matching
        # the flax flatten order; done here so the kernel never reshapes it
        get("fc1", "kernel").reshape(56, 32, -1), get("fc1", "bias"),
        get("fc_out", "kernel"), get("fc_out", "bias"),
    )


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def vv_forward_packed(params, ubound, lbound, packed, use_pallas=True):
    """(value (n,), variance (n,)) from bit-packed boards uint32[n, 20].

    `use_pallas=False` (or any non-TPU backend) runs the identical fused
    math as plain jnp."""
    weights = extract_vv_weights(params)
    n = packed.shape[0]

    if not use_pallas or jax.devices()[0].platform != "tpu":
        out = _forward_block(
            packed, *weights, jnp.asarray(ubound, jnp.float32),
            jnp.asarray(lbound, jnp.float32),
        )
        return out[:, 0], out[:, 1]

    # pad the board count to a TILE multiple
    n_pad = ((n + TILE - 1) // TILE) * TILE
    packed_p = jnp.zeros((n_pad, BOARD_H), jnp.uint32).at[:n].set(packed)
    bounds = jnp.stack([
        jnp.asarray(ubound, jnp.float32), jnp.asarray(lbound, jnp.float32)
    ])

    k1, b1, k2, b2, k3, b3, w_fc, b_fc, w_out, b_out = weights
    grid = (n_pad // TILE,)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, BOARD_H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec, wspec, wspec,
            wspec, wspec, wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec((TILE, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
    )(packed_p, k1, b1, k2, b2, k3, b3, w_fc, b_fc, w_out, b_out, bounds)
    return out[:n, 0], out[:n, 1]


# ---------------------------------------------------------------------------
# XLA im2col formulation (VERDICT r1 item 4 lever b): unlike the kernel and
# the mosaic-legal jnp fusion above, plain XLA may reshape and concatenate
# freely — each conv becomes ONE (n*H*W, 9*C) @ (9*C, 32) MXU matmul and the
# FC block one (n, 1792) @ (1792, 256), instead of per-tap K=32 mini-matmuls.
# ---------------------------------------------------------------------------

def _patches(x, H, W):
    """(n, H+2, W+2, C) -> (n, H, W, 9C): concat of the nine 3x3 taps in
    (dy, dx) row-major order — matching kernel.reshape(9C, out) for a flax
    HWIO (3, 3, C, out) kernel."""
    taps = [
        x[:, dy:dy + H, dx:dx + W, :]
        for dy in range(3) for dx in range(3)
    ]
    return jnp.concatenate(taps, axis=-1)


def vv_forward_xla_im2col(params, ubound, lbound, imgs):
    """VVNet forward on (n, 20, 10, 1) images as three im2col matmuls + one
    FC matmul (pure XLA). Matches `VVNet.apply` to matmul precision."""
    p = params["params"]
    w = lambda name: jnp.asarray(p[name]["kernel"], jnp.float32)
    b = lambda name: jnp.asarray(p[name]["bias"], jnp.float32)
    n = imgs.shape[0]

    x = imgs.astype(jnp.float32)
    x = _patches(x, 18, 8).reshape(n * 18 * 8, 9)
    x = jax.nn.relu(
        jnp.dot(x, w("conv1").reshape(9, 32),
                preferred_element_type=jnp.float32) + b("conv1")
    ).reshape(n, 18, 8, 32)
    x = _patches(x, 16, 6).reshape(n * 16 * 6, 288)
    x = jax.nn.relu(
        jnp.dot(x, w("conv2").reshape(288, 32),
                preferred_element_type=jnp.float32) + b("conv2")
    ).reshape(n, 16, 6, 32)
    x = _patches(x, 14, 4).reshape(n * 14 * 4, 288)
    x = jax.nn.relu(
        jnp.dot(x, w("conv3").reshape(288, 32),
                preferred_element_type=jnp.float32) + b("conv3")
    ).reshape(n, 14 * 4 * 32)
    x = jax.nn.relu(
        jnp.dot(x, w("fc1"), preferred_element_type=jnp.float32) + b("fc1")
    )
    out = jnp.dot(x, w("fc_out"),
                  preferred_element_type=jnp.float32) + b("fc_out")
    out = jax.nn.sigmoid(out) * jnp.asarray(ubound, jnp.float32) \
        + jnp.asarray(lbound, jnp.float32)
    return out[:, 0], out[:, 1]
