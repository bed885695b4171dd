"""Network definitions (flax.linen), TPU-native equivalents of `model/`.

Architecture parity with the reference, layout changed for TPU:

- `VVNet` — the value/variance net (reference `model/model_vv.py:13-52`):
  3x conv(32, 3x3, VALID) + FC256 -> 2 sigmoid outputs scaled to
  [lbound, lbound + ubound]. The reference rescales `out_ubound` to the data
  max before each training session (`model_vv.py:227-231`), so bounds are an
  explicit argument here, not a weight.
- `VPNet` — value+policy net (reference `model/model_vp.py:12-66`): 2x
  conv(32)+norm, split FC streams, scalar value head (bias init 100) and a
  7-way policy head. BatchNorm is replaced by GroupNorm: batch statistics
  would couple lanes across the data-parallel mesh axis and add mutable state
  for zero benefit at 32 channels (documented deviation).
- `DistNet` — C51 categorical value head over `atoms` bins (reference
  `model/model_distributional.py`).

Inputs are NHWC (B, 20, 10, 1) float; TPU conv layouts prefer
channels-last. Compute dtype is configurable (bfloat16 by default on TPU);
params stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

N_ACTIONS = 7


class VVNet(nn.Module):
    """Value/variance CNN. Output (B, 2): sigmoid-bounded [value, variance]."""

    filters: int = 32
    n_fc: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ubound, lbound):
        x = x.astype(self.compute_dtype)
        for i in range(3):
            x = nn.Conv(
                self.filters, (3, 3), padding="VALID",
                dtype=self.compute_dtype, name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.n_fc, dtype=self.compute_dtype, name="fc1")(x)
        x = nn.relu(x)
        # output head pinned f32 like VPNet/DistNet: under a bf16 compute
        # override only the conv/fc256 body runs reduced-precision, the 2-unit
        # head keeps full-precision logits into the bounded sigmoid
        x = nn.Dense(2, dtype=jnp.float32, name="fc_out")(x)
        x = nn.sigmoid(x)
        return x * jnp.asarray(ubound) + jnp.asarray(lbound)


class VPNet(nn.Module):
    """Value+policy CNN. Returns (value (B, 1), policy_logits (B, 7))."""

    filters: int = 32
    n_fc: int = 128
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        for i in range(2):
            x = nn.Conv(
                self.filters, (3, 3), padding="VALID",
                dtype=self.compute_dtype, name=f"conv{i + 1}",
            )(x)
            x = nn.GroupNorm(num_groups=8, dtype=self.compute_dtype, name=f"norm{i + 1}")(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))

        v = nn.Dense(self.n_fc, dtype=self.compute_dtype, name="fc_v")(x)
        v = nn.relu(v)
        # Reference initialises the value-head bias to 100 (model_vp.py:32)
        # so early search sees optimistic values.
        v = nn.Dense(
            1, name="value", dtype=jnp.float32,
            bias_init=nn.initializers.constant(100.0),
        )(v.astype(jnp.float32))

        p = nn.Dense(self.n_fc, dtype=self.compute_dtype, name="fc_p")(x)
        p = nn.relu(p)
        logits = nn.Dense(N_ACTIONS, dtype=jnp.float32, name="policy")(
            p.astype(jnp.float32)
        )
        return v, logits


class DistNet(nn.Module):
    """C51-style categorical value net: (B, atoms) probability simplex."""

    atoms: int = 50
    filters: int = 32
    n_fc: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        for i in range(3):
            x = nn.Conv(
                self.filters, (3, 3), padding="VALID",
                dtype=self.compute_dtype, name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.n_fc, dtype=self.compute_dtype, name="fc1")(x)
        x = nn.relu(x)
        logits = nn.Dense(self.atoms, dtype=jnp.float32, name="fc_out")(
            x.astype(jnp.float32)
        )
        return nn.softmax(logits, axis=-1)


def boards_to_input(boards):
    """(B, 20, 10) int8 getState images -> (B, 20, 10, 1) float NHWC."""
    return boards.astype(jnp.float32)[..., None]


class QNet(nn.Module):
    """DQN Q-network (reference agents/DQN.py:10-25: 2x conv32 + FC128 ->
    7 action values). Input NHWC (B, 20, 10, 1); the reference's DQN used
    22x10 boards — this build standardizes on the engine's 20x10."""

    filters: int = 32
    n_fc: int = 128
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        for i in range(2):
            x = nn.Conv(self.filters, (3, 3), padding="VALID",
                        dtype=self.compute_dtype, name=f"conv{i + 1}")(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.n_fc, dtype=self.compute_dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(N_ACTIONS, dtype=jnp.float32, name="fc_q")(
            x.astype(jnp.float32)
        )


class DistQNet(nn.Module):
    """Distributional DQN head (reference agents/DQN.py:28-45): per-action
    categorical distribution over `atoms` bins. Returns (B, 7, atoms)."""

    atoms: int = 50
    filters: int = 16
    n_fc: int = 128
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        for i in range(2):
            x = nn.Conv(self.filters, (3, 3), padding="VALID",
                        dtype=self.compute_dtype, name=f"conv{i + 1}")(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.n_fc, dtype=self.compute_dtype, name="fc1")(x)
        x = nn.relu(x)
        logits = nn.Dense(N_ACTIONS * self.atoms, dtype=jnp.float32,
                          name="fc_q")(x.astype(jnp.float32))
        return nn.softmax(
            logits.reshape(x.shape[0], N_ACTIONS, self.atoms), axis=-1
        )
