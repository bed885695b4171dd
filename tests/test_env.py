"""Unit + property tests for the JAX Tetris engine against RULES.md.

Covers the behavioural contract SURVEY.md §2.1 extracts from the reference's
pyTetris call sites: action semantics, gravity, locking, line clears (incl.
conservation), guideline/raw scoring, combos, bag determinism, terminal no-op,
and the getState rendering used as the transposition key.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.env.engine import EnvConfig, EnvState
from tetris_mcts_tpu.env.pieces import BOARD_H, BOARD_W, FULL_ROW

CFG = EnvConfig()

NOOP, LEFT, RIGHT, SOFT, ROT_CCW, ROT_CW, HARD = range(7)

# Jit the scalar step per-config: eager dispatch of the many tiny ops in the
# engine is orders of magnitude slower than the compiled program.
_step_jit = jax.jit(engine.step, static_argnums=2)


def jstep(s, a, cfg=CFG):
    return _step_jit(s, jnp.int32(a), cfg)


def mk(rows=None, piece=0, rot=0, px=3, py=0, seed=(1, 2), **kw):
    """Hand-built state for targeted tests."""
    base = engine.reset(seed[0], seed[1], CFG)
    upd = dict(
        piece=jnp.int32(piece), rot=jnp.int32(rot),
        px=jnp.int32(px), py=jnp.int32(py),
    )
    if rows is not None:
        upd["rows"] = jnp.asarray(rows, jnp.uint32)
    upd.update({k: jnp.asarray(v) for k, v in kw.items()})
    return base._replace(**upd)


def cells_of(s):
    img = np.asarray(engine.get_state(s))
    return set(zip(*np.nonzero(img == -1)))


class TestGeometry:
    def test_spawn_renders_four_cells(self):
        s = engine.reset(0, 0, CFG)
        img = np.asarray(engine.get_state(s))
        assert (img == -1).sum() == 4
        assert (img == 1).sum() == 0

    def test_i_piece_base_cells(self):
        s = mk(piece=0, px=3, py=0)
        assert cells_of(s) == {(1, 3), (1, 4), (1, 5), (1, 6)}

    def test_rotation_ccw_is_rot90(self):
        # T piece: base cells (1,0),(1,1),(1,2),(2,1); rot90 CCW of the box.
        s = mk(piece=2, rot=1, px=0, py=0)
        base = np.zeros((4, 4), np.int8)
        for (r, c) in [(1, 0), (1, 1), (1, 2), (2, 1)]:
            base[r, c] = 1
        want = {(r, c) for r, c in zip(*np.nonzero(np.rot90(base, 1)))}
        assert cells_of(s) == want


class TestActions:
    def test_left_right(self):
        s = mk(piece=1, px=4, py=0)  # O piece
        s1 = jstep(s, LEFT, CFG)
        assert int(s1.px) == 3
        s2 = jstep(s, RIGHT, CFG)
        assert int(s2.px) == 5

    def test_wall_blocks_move(self):
        # O piece occupies box cols 1..2, so px=-1 puts cells at cols 0..1.
        s = mk(piece=1, px=-1, py=0)
        s1 = jstep(s, LEFT, CFG)
        assert int(s1.px) == -1  # rejected

    def test_gravity_applies_after_lateral_action(self):
        s = mk(piece=1, px=4, py=0)
        s1 = jstep(s, NOOP, CFG)
        assert int(s1.py) == 1  # app=1: every non-drop action drops one

    def test_gravity_counter_app3(self):
        cfg = EnvConfig(actions_per_drop=3)
        s = mk(piece=1, px=4, py=0)
        s = jstep(s, NOOP, cfg)
        assert int(s.py) == 0 and int(s.gravity) == 1
        s = jstep(s, NOOP, cfg)
        assert int(s.py) == 0 and int(s.gravity) == 2
        s = jstep(s, NOOP, cfg)
        assert int(s.py) == 1 and int(s.gravity) == 0

    def test_soft_drop_moves_one_and_resets_gravity(self):
        cfg = EnvConfig(actions_per_drop=3)
        s = mk(piece=1, px=4, py=0, gravity=jnp.int32(2))
        s1 = jstep(s, SOFT, cfg)
        assert int(s1.py) == 1 and int(s1.gravity) == 0

    def test_rotation_blocked_is_noop(self):
        # I piece vertical next to a full column wall of garbage.
        rows = np.zeros(BOARD_H, np.uint32)
        rows[:] = 0  # empty board: rotation at px=3,py=17 would poke below floor
        s = mk(rows=rows, piece=0, rot=0, px=3, py=17)
        s1 = jstep(s, ROT_CW, CFG)
        # box-spin of I at py=17: vertical I occupies rows 17..20 -> off board
        assert int(s1.rot) == 0


class TestLocking:
    def test_hard_drop_locks_at_bottom(self):
        s = mk(piece=1, px=4, py=0)  # O piece
        s1 = jstep(s, HARD, CFG)
        img = np.asarray(engine.get_state(s1))
        # locked cells at rows 19-18 (box rows 1..2 at py=16..? ) bottom two rows
        locked = set(zip(*np.nonzero(img == 1)))
        assert (19, 5) in locked and (19, 6) in locked
        assert (18, 5) in locked and (18, 6) in locked
        # a fresh piece spawned
        assert (img == -1).sum() == 4
        assert not bool(s1.end)

    def test_soft_drop_on_floor_locks(self):
        s = mk(piece=1, px=4, py=17)  # O cells at rows 18,19
        s1 = jstep(s, SOFT, CFG)
        img = np.asarray(engine.get_state(s1))
        assert (img == 1).sum() == 4

    def test_stack_blocks_drop(self):
        rows = np.zeros(BOARD_H, np.uint32)
        rows[19] = FULL_ROW ^ 0b1  # bottom row full except col 0
        s = mk(rows=rows, piece=1, px=4, py=0)
        s1 = jstep(s, HARD, CFG)
        img = np.asarray(engine.get_state(s1))
        locked = set(zip(*np.nonzero(img == 1)))
        assert (18, 5) in locked and (17, 5) in locked  # rests ON the garbage


class TestLineClear:
    def garbage(self, missing_cols, row):
        rows = np.zeros(BOARD_H, np.uint32)
        mask = FULL_ROW
        for c in missing_cols:
            mask &= ~(1 << c)
        rows[row] = mask
        return rows

    def test_single_clear_and_guideline_score(self):
        # Bottom row missing cols 5,6; drop the O piece into the gap.
        rows = self.garbage([5, 6], 19)
        rows[18] = self.garbage([5, 6], 19)[19] & 0  # row 18 empty
        s = mk(rows=rows, piece=1, px=4, py=0)
        s1 = jstep(s, HARD, CFG)
        assert int(s1.lines) == 1
        # 100 (single) + 2*17 hard-drop cells (guideline drop points)
        assert int(s1.score) == 100 + 2 * 17
        assert int(s1.combo) == 1
        assert list(np.asarray(s1.line_stats)) == [1, 0, 0, 0]
        # the O piece's top two cells remain at the (shifted) bottom row
        img = np.asarray(engine.get_state(s1))
        assert (img[19] == 1).sum() == 2

    def test_double_clear(self):
        rows = np.zeros(BOARD_H, np.uint32)
        mask = FULL_ROW & ~(1 << 5) & ~(1 << 6)
        rows[19] = mask
        rows[18] = mask
        s = mk(rows=rows, piece=1, px=4, py=0)
        s1 = jstep(s, HARD, CFG)
        assert int(s1.lines) == 2
        assert int(s1.score) == 300 + 2 * 17
        assert list(np.asarray(s1.line_stats)) == [0, 1, 0, 0]

    def test_raw_scoring_mode(self):
        cfg = EnvConfig(scoring=1)
        rows = np.zeros(BOARD_H, np.uint32)
        mask = FULL_ROW & ~(1 << 5) & ~(1 << 6)
        rows[19] = mask
        rows[18] = mask
        s = mk(rows=rows, piece=1, px=4, py=0)
        s1 = jstep(s, HARD, cfg)
        assert int(s1.score) == 2

    def test_combo_chain(self):
        # Two consecutive single clears: 100 + (100 + 50*1) = 250.
        mask = FULL_ROW & ~(1 << 5) & ~(1 << 6)
        rows = np.zeros(BOARD_H, np.uint32)
        rows[19] = mask
        rows[17] = mask
        # rows 18,16.. empty -> first O clears row19+its own? No: O fills the
        # gap at rows 18,19 -> row 19 full (clear #1); the remaining O half
        # lands on nothing. Simpler: run two separate drops.
        s = mk(rows=rows * 0, piece=1, px=4, py=0)
        s = s._replace(rows=jnp.asarray(np.where(np.arange(BOARD_H) == 19, mask, 0), jnp.uint32))
        s1 = jstep(s, HARD, CFG)
        assert int(s1.score) == 100 + 2 * 17 and int(s1.combo) == 1
        # inject a second garbage row under the new piece and drop again
        rows2 = np.asarray(s1.rows).copy()
        rows2[19] = mask
        s2 = s1._replace(rows=jnp.asarray(rows2, jnp.uint32), piece=jnp.int32(1), rot=jnp.int32(0), px=jnp.int32(4), py=jnp.int32(0))
        s3 = jstep(s2, HARD, CFG)
        assert int(s3.score) == 100 + 100 + 50 + 4 * 17  # + both drops' points
        assert int(s3.combo) == 2

    def test_block_conservation(self):
        # Locked cell count changes by +4 - 10 * cleared lines every lock.
        s = engine.reset(7, 11, CFG)
        for t in range(200):
            if bool(s.end):
                break
            before = int(np.asarray((s.rows[:, None] >> np.arange(10)) & 1).sum())
            lines_before = int(s.lines)
            s2 = jstep(s, HARD, CFG)
            after = int(np.asarray((s2.rows[:, None] >> np.arange(10)) & 1).sum())
            dl = int(s2.lines) - lines_before
            assert after == before + 4 - 10 * dl
            s = s2


class TestRandomizer:
    def test_bag_determinism(self):
        a = engine.reset(42, 7, CFG)
        b = engine.reset(42, 7, CFG)
        assert int(a.piece) == int(b.piece)
        assert list(np.asarray(a.bag)) == list(np.asarray(b.bag))

    def test_bag_covers_all_pieces(self):
        s = engine.reset(3, 9, CFG)
        seen = [int(s.piece)]
        for _ in range(6):
            s = jstep(s, HARD, CFG)
            if bool(s.end):
                pytest.skip("died during bag test")
            seen.append(int(s.piece))
        assert sorted(seen) == list(range(7))

    def test_uniform_mode_draws(self):
        cfg = EnvConfig(randomizer=1)
        s = engine.reset(1, 1, cfg)
        pieces = [int(s.piece)]
        for _ in range(30):
            if bool(s.end):
                break
            s = jstep(s, HARD, cfg)
            pieces.append(int(s.piece))
        assert len(set(pieces)) > 3  # not stuck on one id


class TestTerminal:
    def test_top_out(self):
        rows = np.full(BOARD_H, FULL_ROW & ~1, np.uint32)  # col 0 open everywhere
        s = mk(rows=rows, piece=1, px=4, py=0)
        # O piece at cols 5,6 overlaps garbage at spawn already; hard drop kills
        s1 = jstep(s, HARD, CFG)
        assert bool(s1.end)

    def test_step_after_end_is_noop(self):
        s = engine.reset(0, 5, CFG)._replace(end=jnp.asarray(True))
        s1 = jstep(s, HARD, CFG)
        assert int(s1.score) == int(s.score)
        assert bool(s1.end)

    def test_soft_reset_continues_rng(self):
        s = engine.reset(5, 6, CFG)
        ctr0 = int(s.ctr)
        s = s._replace(end=jnp.asarray(True), score=jnp.int32(999))
        s2 = engine.soft_reset(s, CFG)
        assert int(s2.score) == 0 and not bool(s2.end)
        assert int(s2.ctr) > ctr0  # kept drawing from the same stream


class TestBatched:
    def test_vmap_matches_scalar(self):
        B = 16
        batch = engine.reset_batch(123, B, CFG)
        actions = jnp.asarray(np.random.RandomState(0).randint(0, 7, size=B))
        stepped = engine.step_batch(batch, actions, CFG)
        for i in [0, 5, 15]:
            single = jax.tree.map(lambda x: x[i], batch)
            want = engine.step(single, actions[i], CFG)
            got = jax.tree.map(lambda x: x[i], stepped)
            for f, w in zip(got, want):
                np.testing.assert_array_equal(np.asarray(f), np.asarray(w))

    def test_jit_scan_rollout(self):
        B = 32
        cfg = CFG

        @jax.jit
        def rollout(states, actions):
            def body(s, a):
                s = engine.step_batch(s, a, cfg)
                return s, s.score
            return jax.lax.scan(body, states, actions)

        states = engine.reset_batch(9, B, cfg)
        acts = jnp.asarray(np.random.RandomState(1).randint(0, 7, size=(50, B)))
        final, scores = rollout(states, acts)
        assert scores.shape == (50, B)
        assert np.all(np.asarray(final.lines) >= 0)


class TestPackedObs:
    def test_pack_unpack_roundtrip(self):
        """pack_obs/unpack_obs must reproduce getState exactly (the packed
        form is the storage format of the search layer and replay ring)."""
        import jax
        import jax.numpy as jnp

        from tetris_mcts_tpu.env import engine

        s = engine.reset(5, 9, engine.EnvConfig())
        rng = np.random.RandomState(0)
        for _ in range(50):
            a = int(rng.randint(0, 7))
            s = engine.step(s, jnp.int32(a), engine.EnvConfig())
        img = np.asarray(engine.get_state(s))
        packed = engine.pack_obs(s)
        np.testing.assert_array_equal(
            np.asarray(engine.unpack_obs(packed)), img
        )

    def test_pack_batched(self):
        import jax
        import jax.numpy as jnp

        from tetris_mcts_tpu.env import engine

        envs = engine.reset_batch(3, 8, engine.EnvConfig())
        packed = jax.vmap(engine.pack_obs)(envs)
        imgs = jax.vmap(engine.get_state)(envs)
        np.testing.assert_array_equal(
            np.asarray(engine.unpack_obs(packed)), np.asarray(imgs)
        )
