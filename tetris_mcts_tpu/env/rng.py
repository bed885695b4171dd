"""Counter-based RNG shared by the JAX engine and the C++ oracle.

The env carries an explicit (k0, k1, ctr) uint32 triple and draws words with
threefry2x32 (Salmon et al., "Parallel random numbers: as easy as 1, 2, 3",
SC'11 — the same keyed counter PRNG family JAX uses). One `next_u32` draw is
one threefry2x32(k=(k0,k1), c=(ctr,0)) call returning lane 0; the second lane
is discarded so the draw sequence is trivially reproducible in scalar C++
(`native/oracle.cpp` implements the identical function).

Everything here is pure jnp on uint32 with wrap-around arithmetic, so it jits,
vmaps, and runs on the TPU VPU without host round-trips.
"""

import jax.numpy as jnp

_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
_PARITY = jnp.uint32(0x1BD11BDA)


def _rotl(x, d):
    return (x << jnp.uint32(d)) | (x >> jnp.uint32(32 - d))


def threefry2x32(k0, k1, c0, c1):
    """20-round threefry2x32. All args/results uint32 (any broadcastable shape)."""
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    ks = (k0, k1, k0 ^ k1 ^ _PARITY)
    x0 = jnp.asarray(c0, jnp.uint32) + k0
    x1 = jnp.asarray(c1, jnp.uint32) + k1
    for outer in range(5):
        rots = _ROT_A if outer % 2 == 0 else _ROT_B
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        x0 = x0 + ks[(outer + 1) % 3]
        x1 = x1 + ks[(outer + 2) % 3] + jnp.uint32(outer + 1)
    return x0, x1


def next_u32(k0, k1, ctr):
    """Draw one uint32; returns (word, new_ctr)."""
    word, _ = threefry2x32(k0, k1, ctr, jnp.uint32(0))
    return word, ctr + jnp.uint32(1)


def fisher_yates7(k0, k1, ctr):
    """A fresh 7-bag: Fisher-Yates over [0..6] with one draw per swap.

    Exactly the loop in RULES.md "Randomizers": for i = 6..1,
    j = next_u32() % (i+1); swap bag[i], bag[j]. Returns (bag int32[7], ctr).
    """
    bag = jnp.arange(7, dtype=jnp.int32)
    for i in range(6, 0, -1):
        word, ctr = next_u32(k0, k1, ctr)
        j = (word % jnp.uint32(i + 1)).astype(jnp.int32)
        bi = bag[i]
        bj = bag[j]
        bag = bag.at[i].set(bj)
        bag = bag.at[j].set(bi)
    return bag, ctr
