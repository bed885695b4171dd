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


def _perm7_table():
    """All 5040 permutations of [0..6] in lexicographic order (matches C++
    std::next_permutation enumeration from the sorted array)."""
    import itertools

    import numpy as np

    return jnp.asarray(
        np.asarray(list(itertools.permutations(range(7))), np.int32)
    )


_PERM7 = _perm7_table()  # (5040, 7) int32


def fisher_yates7(k0, k1, ctr):
    """A fresh 7-bag: ONE threefry draw indexes the lexicographic permutation
    table of {0..6} (RULES.md "Randomizers"): bag = PERM7[next_u32() % 5040].

    Uniform over all 5040 bags (same distribution as a Fisher-Yates shuffle;
    modulo bias is 2^32 mod 5040 ≈ 4e-7). One table gather replaces six
    sequential threefry calls — the bag refill sits on the both-branches path
    of every vmapped `engine.step`, so its serial op count is a first-order
    term of MCTS throughput. The C++ oracle (`native/oracle.cpp`) builds the
    identical table with std::next_permutation. Returns (bag int32[7], ctr).
    """
    word, ctr = next_u32(k0, k1, ctr)
    idx = (word % jnp.uint32(5040)).astype(jnp.int32)
    return _PERM7[idx], ctr
