"""Bit-exact parity: JAX engine vs independent scalar C++ oracle.

The north-star requirement (BASELINE.md "Env correctness") is seed-exact board
dynamics. Both implementations are written from env/RULES.md; these tests drive
them through long random action sequences across all config combinations and
assert every state field matches after every step.

The JAX side runs the whole trace in one `lax.scan` (auto-resetting on death,
like the batched self-play driver does) and the full state history is compared
against the oracle on the host afterwards — one compile, one transfer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_mcts_tpu.env import engine, rng
from tetris_mcts_tpu.env.engine import EnvConfig
from tetris_mcts_tpu.utils import oracle as co

FIELDS = [
    "rows", "piece", "rot", "px", "py", "bag", "bag_pos",
    "k0", "k1", "ctr", "gravity", "score", "combo", "lines",
    "line_stats", "end",
]


def trace_jax(cfg, k0, k1, actions):
    """History of states after each action, with soft-reset-on-death applied
    AFTER recording (so terminal states are visible to the comparison)."""

    @jax.jit
    def run(s, acts):
        def body(s, a):
            s = engine.step(s, a, cfg)
            nxt = jax.lax.cond(
                s.end, lambda st: engine.soft_reset(st, cfg), lambda st: st, s
            )
            return nxt, s

        return jax.lax.scan(body, s, acts)

    s0 = engine.reset(k0, k1, cfg)
    _, hist = run(s0, jnp.asarray(actions, jnp.int32))
    return jax.device_get(s0), jax.device_get(hist)


def trace_oracle(cfg, k0, k1, actions):
    o = co.Oracle(k0, k1, cfg.actions_per_drop, cfg.scoring, cfg.randomizer)
    first = o.snapshot()
    hist = []
    for a in actions:
        o.play(int(a))
        hist.append(o.snapshot())
        if o.end:
            o.reset()
    return first, hist


def compare(jax_first, jax_hist, orc_first, orc_hist, n):
    for f in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(jax_first, f)), np.asarray(orc_first[f]),
            err_msg=f"reset field={f}",
        )
    for f in FIELDS:
        got = np.asarray(getattr(jax_hist, f))
        want = np.stack([np.asarray(s[f]) for s in orc_hist])
        bad = np.nonzero(
            (got != want).reshape(n, -1).any(axis=1)
        )[0]
        assert bad.size == 0, (
            f"field={f} first divergence at t={bad[0] if bad.size else '?'}:\n"
            f"jax={got[bad[0]] if bad.size else None}\n"
            f"orc={want[bad[0]] if bad.size else None}"
        )


def test_threefry_matches():
    cases = [(0, 0, 0, 0), (1, 2, 3, 0), (0xDEADBEEF, 0xCAFEBABE, 7, 0),
             (2**32 - 1, 2**32 - 1, 2**32 - 1, 2**32 - 1)]
    for k0, k1, c0, c1 in cases:
        j0, _ = rng.threefry2x32(
            jnp.uint32(k0), jnp.uint32(k1), jnp.uint32(c0), jnp.uint32(c1)
        )
        assert int(j0) == co.threefry_lane0(k0, k1, c0, c1), (k0, k1, c0, c1)


@pytest.mark.parametrize("app", [0, 1, 2])
@pytest.mark.parametrize("scoring", [0, 1])
@pytest.mark.parametrize("randomizer", [0, 1])
def test_random_trace_parity(app, scoring, randomizer):
    cfg = EnvConfig(actions_per_drop=app, scoring=scoring, randomizer=randomizer)
    n = 500
    k0, k1 = 0x1234, 0x5678 + app * 100 + scoring * 10 + randomizer
    acts = np.random.RandomState(app * 7 + scoring * 3 + randomizer).randint(
        0, 7, size=n
    )
    jf, jh = trace_jax(cfg, k0, k1, acts)
    of, oh = trace_oracle(cfg, k0, k1, acts)
    compare(jf, jh, of, oh, n)


def test_stacking_game_parity():
    """Lateral-heavy play with periodic hard drops builds real stacks and
    exercises lock/clear/combo/bag-refill paths."""
    cfg = EnvConfig()
    n = 800
    rnd = np.random.RandomState(42)
    acts = rnd.choice([0, 1, 2, 4, 5, 6], p=[.1, .2, .2, .15, .15, .2], size=n)
    jf, jh = trace_jax(cfg, 99, 177, acts)
    of, oh = trace_oracle(cfg, 99, 177, acts)
    compare(jf, jh, of, oh, n)


def test_getstate_image_parity():
    cfg = EnvConfig()
    step = jax.jit(engine.step, static_argnums=2)
    get_state = jax.jit(engine.get_state)
    s = engine.reset(5, 31, cfg)
    o = co.Oracle(5, 31, 1, 0, 0)
    rnd = np.random.RandomState(3)
    for t in range(60):
        a = int(rnd.randint(0, 7))
        s = step(s, jnp.int32(a), cfg)
        o.play(a)
        np.testing.assert_array_equal(
            np.asarray(get_state(s)), o.getState(), err_msg=f"t={t}"
        )
        if bool(s.end):
            break
