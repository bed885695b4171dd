"""Batched, pure-functional Tetris engine (the TPU-native pyTetris).

Implements RULES.md exactly. The reference system drives an external C++
`pyTetris` object per game (`/root/reference/play.py:75-76,150`,
`/root/reference/agents/agent.py:101-130` for the API contract:
`play(a)`, `getState()`, `score/combo/line_clears/line_stats/end`, `reset`,
value-equality keys). Here the environment is a pytree of arrays and
`step`/`reset` are pure jnp functions: `jax.vmap` steps thousands of boards in
lockstep and the whole self-play loop compiles into one XLA program — there is
no host<->device or Python<->C++ boundary per move (the throughput killer
identified in SURVEY.md §3.1).

Board representation: 20 uint32 bit-rows (bit c = column c occupied). All
collision tests and merges are elementwise bit-ops over (20,) vectors, which
vmap to (B, 20) VPU ops; there are no gathers in the hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tetris_mcts_tpu.env import rng as _rng
from tetris_mcts_tpu.env.pieces import (
    BOARD_H,
    BOARD_W,
    CLEAR_SCORE,
    COMBO_SCORE,
    FULL_ROW,
    PIECE_CELLS,
    SPAWN_X,
    SPAWN_Y,
)

_CELLS = jnp.asarray(PIECE_CELLS)  # (7, 4, 4, 2) int32
_CLEAR_SCORE = jnp.asarray(CLEAR_SCORE)  # (5,) int32
_ROW_IDX = jnp.arange(BOARD_H, dtype=jnp.int32)  # (20,)


class EnvConfig(NamedTuple):
    """Static env configuration (mirrors `Tetris((20,10), app, scoring, randomizer)`,
    `/root/reference/play.py:75`). Static: baked into the compiled program."""

    actions_per_drop: int = 1
    scoring: int = 0  # 0 = guideline, 1 = raw line clears
    randomizer: int = 0  # 0 = 7-bag, 1 = uniform


class EnvState(NamedTuple):
    """One Tetris game. Batched states carry a leading axis on every field."""

    rows: jax.Array        # uint32[20] locked stack bit-rows
    piece: jax.Array       # int32 current piece id 0..6
    rot: jax.Array         # int32 rotation 0..3
    px: jax.Array          # int32 box left col
    py: jax.Array          # int32 box top row
    bag: jax.Array         # int32[7] current bag order
    bag_pos: jax.Array     # int32 next index into bag (7 = empty)
    k0: jax.Array          # uint32 rng key lane 0
    k1: jax.Array          # uint32 rng key lane 1
    ctr: jax.Array         # uint32 rng counter
    gravity: jax.Array     # int32 actions since last drop
    score: jax.Array       # int32
    combo: jax.Array       # int32
    lines: jax.Array       # int32 total line clears
    line_stats: jax.Array  # int32[4] single/double/triple/tetris counts
    end: jax.Array         # bool


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def piece_rows(piece, rot, px, py):
    """Render the current piece as uint32[20] bit-rows (cells off-board dropped)."""
    cells = _CELLS[piece, rot]  # (4, 2)
    ys = py + cells[:, 0]
    xs = px + cells[:, 1]
    ok = (xs >= 0) & (xs < BOARD_W) & (ys >= 0) & (ys < BOARD_H)
    bits = jnp.where(ok, jnp.uint32(1) << jnp.clip(xs, 0, BOARD_W - 1).astype(jnp.uint32), jnp.uint32(0))
    onehot = (ys[:, None] == _ROW_IDX[None, :]).astype(jnp.uint32)  # (4, 20)
    return jnp.sum(onehot * bits[:, None], axis=0, dtype=jnp.uint32)  # cells are unique


def collides(rows, piece, rot, px, py):
    """True if the piece at (px, py) overlaps the stack or leaves the board."""
    cells = _CELLS[piece, rot]
    ys = py + cells[:, 0]
    xs = px + cells[:, 1]
    oob = (xs < 0) | (xs >= BOARD_W) | (ys < 0) | (ys >= BOARD_H)
    overlap = jnp.any(rows & piece_rows(piece, rot, px, py) != 0)
    return jnp.any(oob) | overlap


def max_drop(rows, piece, rot, px, py):
    """Largest d >= 0 such that the piece can sit at py + d (no loop: per-cell
    first-occupied-below via broadcast shifts, min over the 4 cells)."""
    cells = _CELLS[piece, rot]
    ys = py + cells[:, 0]  # (4,)
    xs = px + cells[:, 1]
    col_bits = (rows[None, :] >> xs[:, None].astype(jnp.uint32)) & jnp.uint32(1)  # (4, 20)
    below = (col_bits == 1) & (_ROW_IDX[None, :] > ys[:, None])
    any_below = jnp.any(below, axis=1)
    first_below = jnp.argmax(below, axis=1).astype(jnp.int32)
    limit = jnp.where(any_below, first_below - ys - 1, BOARD_H - 1 - ys)
    return jnp.maximum(jnp.min(limit), 0)


# ---------------------------------------------------------------------------
# spawning / locking
# ---------------------------------------------------------------------------

def _draw_piece(s: EnvState, cfg: EnvConfig):
    """Next piece id per the configured randomizer; returns (piece, state).

    Branchless (jnp.where, no lax.cond): under vmap a cond executes both
    branches anyway, and cond's batching rule materializes closed-over
    constants per batch element — for the (5040, 7) permutation table that
    was a B×5040×7 broadcast (21 GB at B=8192). The refill draw always runs;
    the counter only advances when the refill is taken, so the draw sequence
    is unchanged (bit-exact vs the C++ oracle)."""
    if cfg.randomizer == 1:
        word, ctr = _rng.next_u32(s.k0, s.k1, s.ctr)
        piece = (word % jnp.uint32(7)).astype(jnp.int32)
        return piece, s._replace(ctr=ctr)

    need = s.bag_pos >= 7
    new_bag, ctr2 = _rng.fisher_yates7(s.k0, s.k1, s.ctr)
    bag = jnp.where(need, new_bag, s.bag)
    pos = jnp.where(need, 0, s.bag_pos)
    ctr = jnp.where(need, ctr2, s.ctr)
    piece = bag[pos]
    return piece, s._replace(bag=bag, bag_pos=pos + 1, ctr=ctr)


def _spawn(s: EnvState, cfg: EnvConfig) -> EnvState:
    piece, s = _draw_piece(s, cfg)
    px = jnp.int32(SPAWN_X)
    py = jnp.int32(SPAWN_Y)
    rot = jnp.int32(0)
    dead = collides(s.rows, piece, rot, px, py)
    return s._replace(
        piece=piece, rot=rot, px=px, py=py, gravity=jnp.int32(0),
        end=s.end | dead,
    )


def _clear_lines(rows):
    """Remove full rows, shifting the stack down. Returns (rows, n_cleared)."""
    full = rows == jnp.uint32(FULL_ROW)
    notfull = ~full
    # dst[r] = 19 - (# non-full rows strictly below r); full rows contribute 0.
    below = jnp.cumsum(notfull[::-1].astype(jnp.int32))[::-1] - notfull.astype(jnp.int32)
    dst = jnp.int32(BOARD_H - 1) - below
    keep = jnp.where(notfull, rows, jnp.uint32(0))
    new_rows = jnp.zeros_like(rows).at[dst].add(keep)
    return new_rows, jnp.sum(full.astype(jnp.int32))


def _lock(s: EnvState, cfg: EnvConfig) -> EnvState:
    merged = s.rows | piece_rows(s.piece, s.rot, s.px, s.py)
    rows, n = _clear_lines(merged)
    cleared = n > 0
    if cfg.scoring == 0:
        gained = jnp.where(cleared, _CLEAR_SCORE[n] + jnp.int32(COMBO_SCORE) * s.combo, 0)
    else:
        gained = n
    s = s._replace(
        rows=rows,
        score=s.score + gained,
        combo=jnp.where(cleared, s.combo + 1, 0),
        lines=s.lines + n,
        line_stats=jnp.where(
            cleared,
            s.line_stats.at[jnp.maximum(n - 1, 0)].add(1),
            s.line_stats,
        ),
    )
    return _spawn(s, cfg)


# ---------------------------------------------------------------------------
# step / reset
# ---------------------------------------------------------------------------

def _step_alive(s: EnvState, action, cfg: EnvConfig) -> EnvState:
    a = action.astype(jnp.int32)

    # Lateral effect (left/right/rotations) — single collision check.
    dx = jnp.where(a == 1, -1, jnp.where(a == 2, 1, 0))
    drot = jnp.where(a == 4, 1, jnp.where(a == 5, 3, 0))  # CCW = +1 (rot90 k>0)
    npx = s.px + dx
    nrot = (s.rot + drot) % 4
    blocked = collides(s.rows, s.piece, nrot, npx, s.py)
    px = jnp.where(blocked, s.px, npx)
    rot = jnp.where(blocked, s.rot, nrot)
    s = s._replace(px=px, rot=rot)

    # Vertical effect (RULES.md "Gravity"): hard drops lock; soft drop and a
    # fired gravity tick descend one (locking when blocked). With
    # actions_per_drop <= 0 auto-gravity is OFF (pieces descend only via
    # drops) — the semantics the reference demo recording evidences
    # (RULES.md "Gravity", demo/test.gif analysis).
    hard = a == 6
    soft = a == 3
    lateral = ~hard & ~soft
    g_next = s.gravity + 1
    if cfg.actions_per_drop <= 0:
        grav_fires = jnp.asarray(False)
        g_keep = jnp.int32(0)
    else:
        grav_fires = lateral & (g_next >= cfg.actions_per_drop)
        g_keep = g_next
    md = max_drop(s.rows, s.piece, s.rot, s.px, s.py)

    want_down = soft | grav_fires
    drop_n = jnp.where(hard, md, jnp.where(want_down, jnp.minimum(md, 1), 0))
    lock_now = hard | (want_down & (md == 0))
    # Guideline drop points (RULES.md "Scoring"): +1 per soft-dropped cell,
    # +2 per hard-dropped cell; gravity descents score nothing. Externally
    # evidenced by the reference endless log (0-line episodes score 262-486,
    # odd values ⇒ the 1-point component exists) and README v2's
    # tetris.wiki/Scoring adoption.
    if cfg.scoring == 0:
        drop_pts = jnp.where(hard, 2 * md, jnp.where(soft, jnp.minimum(md, 1), 0))
    else:
        drop_pts = jnp.int32(0)
    s = s._replace(
        py=s.py + drop_n,
        score=s.score + drop_pts,
        gravity=jnp.where(hard | soft | grav_fires, 0, g_keep),
    )
    # branchless (see _draw_piece docstring): both paths run under vmap anyway
    locked = _lock(s, cfg)
    return jax.tree.map(
        lambda a, b: jnp.where(lock_now, a, b), locked, s
    )


def step(s: EnvState, action, cfg: EnvConfig = EnvConfig()) -> EnvState:
    """Play one action. No-op once `end` is set (reference `game.end` contract)."""
    stepped = _step_alive(s, jnp.asarray(action), cfg)
    return jax.tree.map(lambda a, b: jnp.where(s.end, b, a), stepped, s)


def reset(k0, k1, cfg: EnvConfig = EnvConfig()) -> EnvState:
    """Fresh game from an explicit uint32 key pair (counter starts at 0)."""
    s = EnvState(
        rows=jnp.zeros(BOARD_H, jnp.uint32),
        piece=jnp.int32(0), rot=jnp.int32(0),
        px=jnp.int32(SPAWN_X), py=jnp.int32(SPAWN_Y),
        bag=jnp.arange(7, dtype=jnp.int32), bag_pos=jnp.int32(7),
        k0=jnp.asarray(k0, jnp.uint32), k1=jnp.asarray(k1, jnp.uint32),
        ctr=jnp.uint32(0),
        gravity=jnp.int32(0),
        score=jnp.int32(0), combo=jnp.int32(0), lines=jnp.int32(0),
        line_stats=jnp.zeros(4, jnp.int32),
        end=jnp.asarray(False),
    )
    return _spawn(s, cfg)


def soft_reset(s: EnvState, cfg: EnvConfig = EnvConfig()) -> EnvState:
    """`game.reset()`: clear the board/score but keep drawing from the same RNG
    stream (RULES.md "Terminal behaviour")."""
    fresh = EnvState(
        rows=jnp.zeros(BOARD_H, jnp.uint32),
        piece=jnp.int32(0), rot=jnp.int32(0),
        px=jnp.int32(SPAWN_X), py=jnp.int32(SPAWN_Y),
        bag=jnp.arange(7, dtype=jnp.int32), bag_pos=jnp.int32(7),
        k0=s.k0, k1=s.k1, ctr=s.ctr,
        gravity=jnp.int32(0),
        score=jnp.int32(0), combo=jnp.int32(0), lines=jnp.int32(0),
        line_stats=jnp.zeros(4, jnp.int32),
        end=jnp.asarray(False),
    )
    return _spawn(fresh, cfg)


# ---------------------------------------------------------------------------
# observation
# ---------------------------------------------------------------------------

def get_state(s: EnvState):
    """int8[20,10] image: 0 empty, 1 locked, -1 current piece
    (`getState()` contract, `/root/reference/play.py:110`)."""
    prow = piece_rows(s.piece, s.rot, s.px, s.py)
    cols = jnp.arange(BOARD_W, dtype=jnp.uint32)
    locked = ((s.rows[:, None] >> cols[None, :]) & 1).astype(jnp.int8)
    pc = ((prow[:, None] >> cols[None, :]) & 1).astype(jnp.int8)
    return jnp.where(pc == 1, jnp.int8(-1), locked)


def obs_bits(s: EnvState):
    """(rows uint32[20], piece_rows uint32[20]) — the transposition key payload."""
    return s.rows, piece_rows(s.piece, s.rot, s.px, s.py)


_ROW_OF = jnp.asarray(np.arange(BOARD_H * BOARD_W) // BOARD_W, jnp.int32)
_COL_OF = jnp.asarray(np.tile(np.arange(BOARD_W), BOARD_H), jnp.uint32)


def get_state_flat(s: EnvState):
    """float32[200] getState image flattened row-major (0 empty, 1 locked,
    -1 current piece) — same values as `get_state` but FLAT: under TPU
    tiling a (20, 10) int image pads 20x (int8 tiles are (32, 128)), and the
    evaluator's per-sim render of B x 7 such images measured ~460 us/sim of
    elementwise ops on 20x-padded buffers. A (200,)-flat layout pads 1.28x;
    the NHWC reshape happens once at the conv input. Locked and piece cells
    are disjoint, so image = locked_bit - piece_bit.

    Measured: swapping the move program's evaluators to this renderer was
    NEUTRAL (92.2k -> 91.3k sims/s) — XLA already fuses the (20, 10) render
    into the conv input processing, and the flat->NHWC reshape costs what
    the flat ops save. Kept for consumers that want a flat image without an
    NHWC hop (dashboards, data export)."""
    rows, prow = obs_bits(s)
    w = jnp.take(rows, _ROW_OF, axis=-1)
    p = jnp.take(prow, _ROW_OF, axis=-1)
    locked = ((w >> _COL_OF) & jnp.uint32(1)).astype(jnp.float32)
    piece = ((p >> _COL_OF) & jnp.uint32(1)).astype(jnp.float32)
    # piece wins where both bits are set (spawn-dead states overlap the
    # stack; getState renders the colliding spawn as -1) — plain
    # locked - piece would render those cells 0
    return locked * (1.0 - piece) - piece


def pack_obs(s: EnvState):
    """uint32[20] packed observation: bits 0-9 locked row, bits 10-19 piece
    row. One word per board row — the TPU-friendly storage form of the
    getState image (rows only use BOARD_W=10 bits). Equivalent to the
    reference's `state.tobytes()` dict key (`agents/agent.py:114-117`) for
    every LIVE state; on spawn-dead boards it is strictly FINER — a locked
    cell hidden under the colliding piece keeps its bit here but renders as
    -1 in the image, so two such states can share an image yet get separate
    obs slots. Terminal states never share statistics usefully (obs_end
    gates them), so the finer key is deliberate."""
    rows, prow = obs_bits(s)
    return rows | (prow << jnp.uint32(10))


def unpack_obs(packed):
    """uint32[..., 20] packed words -> int8[..., 20, 10] getState image
    (0 empty, 1 locked, -1 piece). Inverse of `pack_obs`; used outside the
    hot move program (training-batch prep, replay viewers)."""
    packed = jnp.asarray(packed, jnp.uint32)
    cols = jnp.arange(BOARD_W, dtype=jnp.uint32)
    locked = ((packed[..., None] >> cols) & 1).astype(jnp.int8)
    piece = ((packed[..., None] >> (cols + jnp.uint32(10))) & 1).astype(jnp.int8)
    return jnp.where(piece == 1, jnp.int8(-1), locked)


STATE_WORDS = 44  # pack_state vector length


def pack_state(s: EnvState):
    """uint32[..., 44] lossless packing of a FULL EnvState (cf. the
    reference C++ agent's 200-byte `_getState()` node snapshots,
    `agents/cppmodule/agent.cpp:27,243`). Layout: rows[0:20], piece, rot,
    px, py, bag[24:31], bag_pos, k0, k1, ctr, gravity, score, combo, lines,
    line_stats[39:43], end[43]. Int fields are bitcast (sign-preserving); the
    search layer stores one vector per tree node so the selection kernel can
    hand back a leaf id and the leaf state is a single gather + unpack."""
    u = lambda x: jax.lax.bitcast_convert_type(
        jnp.asarray(x, jnp.int32), jnp.uint32
    )
    parts = [
        s.rows,
        u(s.piece)[..., None], u(s.rot)[..., None],
        u(s.px)[..., None], u(s.py)[..., None],
        u(s.bag), u(s.bag_pos)[..., None],
        s.k0[..., None], s.k1[..., None], s.ctr[..., None],
        u(s.gravity)[..., None], u(s.score)[..., None],
        u(s.combo)[..., None], u(s.lines)[..., None],
        u(s.line_stats),
        u(s.end.astype(jnp.int32))[..., None],
    ]
    return jnp.concatenate(parts, axis=-1)


def unpack_state(vec) -> EnvState:
    """Inverse of `pack_state`. vec uint32[..., 44] -> EnvState with the
    leading shape."""
    vec = jnp.asarray(vec, jnp.uint32)
    i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    return EnvState(
        rows=vec[..., 0:20],
        piece=i(vec[..., 20]), rot=i(vec[..., 21]),
        px=i(vec[..., 22]), py=i(vec[..., 23]),
        bag=i(vec[..., 24:31]), bag_pos=i(vec[..., 31]),
        k0=vec[..., 32], k1=vec[..., 33], ctr=vec[..., 34],
        gravity=i(vec[..., 35]), score=i(vec[..., 36]),
        combo=i(vec[..., 37]), lines=i(vec[..., 38]),
        line_stats=i(vec[..., 39:43]),
        end=vec[..., 43] != 0,
    )


# ---------------------------------------------------------------------------
# batched wrappers
# ---------------------------------------------------------------------------

def reset_batch(seed: int, batch: int, cfg: EnvConfig = EnvConfig()) -> EnvState:
    """B independent games with per-game keys derived from one integer seed."""
    base = np.uint32(seed)
    k0 = jnp.full((batch,), base, jnp.uint32)
    k1 = jnp.arange(batch, dtype=jnp.uint32) + jnp.uint32(1)
    return jax.vmap(lambda a, b: reset(a, b, cfg))(k0, k1)


def step_batch(states: EnvState, actions, cfg: EnvConfig = EnvConfig()) -> EnvState:
    return jax.vmap(lambda s, a: step(s, a, cfg))(states, actions)


def get_state_batch(states: EnvState):
    return jax.vmap(get_state)(states)
