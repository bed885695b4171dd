"""The Tetris engine step on packed (B, 44) uint32 states, kernel-safe.

`engine.step` (env/engine.py) is the semantics authority (itself implementing
env/RULES.md in lockstep with the C++ oracle). This module re-expresses the
identical step on `engine.pack_state` vectors using ONLY operations that
Mosaic legalizes inside a Pallas TPU kernel, so the fused selection kernel
(ops/tree_walk.py) can carry the env state per lane and step it inline while
descending — eliminating both the per-node state store (svec) and the
separate leaf replay that capped the select-kernel path (measured: svec
expansion upkeep alone cost more than the whole XLA selection walk).

Kernel-legal vocabulary (everything here is bit-exact vs engine.step,
fuzz-tested in tests/test_ops.py):
- LUT lookups become masked sums: the (7, 4, 4, 2) piece table is folded
  over the 28 (piece, rot) combos with (B, 1) compares; the (5040, 7)
  permutation table of the bag randomizer is replaced by the factorial-digit
  decode of the lexicographic index (exactly PERM7[idx] — the table IS the
  lexicographic enumeration), with digits extracted by conditional
  subtraction instead of division.
- u32 mod-by-constant (the raw threefry word) avoids integer division:
  reduce via 2^16 ≡ c (mod m) to < 2^24, one exact-float reciprocal multiply
  for the quotient, then integer corrections (the float result is within 1
  of the true quotient; corrections are exact integer compares).
- per-cell geometry, collision, drop distance, and line clears are
  compare/select/reduce over (B, 20) and (B, 4) vectors; the row-compaction
  scatter of `_clear_lines` unrolls over the 20 rows; the
  non-full-rows-below count uses a (20, 20) 0/1 matmul (counts <= 20 are
  exact in f32).
- booleans are widened to i32 before any minor-dim broadcast (Mosaic only
  broadcasts 32-bit types into new minor extents).

The module is pure jnp: outside a kernel it runs as plain XLA (how the fuzz
tests drive it), inside `pl.pallas_call` it legalizes as VPU/MXU ops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

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

# (28, 4) per-combo cell offsets as plain Python ints (a Pallas kernel may
# not capture ARRAY constants — every table fold below uses scalar
# immediates); combo id = piece * 4 + rot.
_CY = PIECE_CELLS.reshape(28, 4, 2)[:, :, 0].tolist()
_CX = PIECE_CELLS.reshape(28, 4, 2)[:, :, 1].tolist()
# (7, 4) spawn-orientation cells (rot = 0).
_CY0 = PIECE_CELLS[:, 0, :, 0].tolist()
_CX0 = PIECE_CELLS[:, 0, :, 1].tolist()

_FACT = (720, 120, 24, 6, 2)  # factorial place values for 7 digits


def _i(x):
    return lax.bitcast_convert_type(x, jnp.int32)


def _u(x):
    return lax.bitcast_convert_type(x, jnp.uint32)


def _mask(flag_i32, n):
    """(B, 1) i32 0/1 flag -> (B, n) bool (broadcast the i32, compare after —
    Mosaic's minor-dim broadcast rule)."""
    return jnp.broadcast_to(flag_i32, (flag_i32.shape[0], n)) != 0


def _lut_fold(sel, ytab, xtab):
    """Kernel-safe LUT gather: sel (B, 1) i32 row selector, ytab/xtab lists
    of 4-int rows -> (ys, xs), each (B, 4) i32, built column-wise from
    SCALAR immediates (array constants may not be captured by a kernel)."""
    B = sel.shape[0]
    ycols, xcols = [], []
    for i in range(4):
        y = jnp.zeros((B, 1), jnp.int32)
        x = jnp.zeros((B, 1), jnp.int32)
        for c in range(len(ytab)):
            hit = sel == c
            y = y + jnp.where(hit, int(ytab[c][i]), 0)
            x = x + jnp.where(hit, int(xtab[c][i]), 0)
        ycols.append(y)
        xcols.append(x)
    return jnp.concatenate(ycols, axis=1), jnp.concatenate(xcols, axis=1)


def _cells(combo):
    """(B, 1) combo id (= piece * 4 + rot) -> per-cell (dy, dx) offsets,
    each (B, 4) i32."""
    return _lut_fold(combo, _CY, _CX)


def _cells_spawn(piece):
    """(B, 1) piece id -> spawn-orientation cells, each (B, 4) i32."""
    return _lut_fold(piece, _CY0, _CX0)


def _abs_cells(cells, px, py):
    """Box offsets -> absolute (ys, xs), each (B, 4) i32."""
    dy, dx = cells
    return py + dy, px + dx


def _prow(ys, xs):
    """Absolute cells -> piece bit-rows (B, 20) u32 (off-board cells drop),
    `engine.piece_rows` semantics."""
    B = ys.shape[0]
    riota = lax.broadcasted_iota(jnp.int32, (B, BOARD_H), 1)
    ok = (xs >= 0) & (xs < BOARD_W) & (ys >= 0) & (ys < BOARD_H)
    xc = jnp.clip(xs, 0, BOARD_W - 1).astype(jnp.uint32)
    bits = jnp.where(ok, jnp.uint32(1) << xc, jnp.uint32(0))  # (B, 4)
    out = jnp.zeros((B, BOARD_H), jnp.uint32)
    for i in range(4):
        out = out | jnp.where(
            riota == ys[:, i : i + 1], bits[:, i : i + 1], jnp.uint32(0)
        )
    return out


def _collides(rows, ys, xs):
    """(B, 1) i32 0/1: any cell out of board or overlapping the stack
    (`engine.collides`)."""
    oob = jnp.any(
        (xs < 0) | (xs >= BOARD_W) | (ys < 0) | (ys >= BOARD_H),
        axis=1,
        keepdims=True,
    )
    # i32 reduce — Mosaic has no unsigned reductions
    hits = ((rows & _prow(ys, xs)) != jnp.uint32(0)).astype(jnp.int32)
    overlap = jnp.sum(hits, axis=1, keepdims=True) > 0
    return (oob | overlap).astype(jnp.int32)


def _max_drop(rows, ys, xs):
    """Largest d >= 0 with the piece free at py + d (`engine.max_drop`):
    per-cell first-occupied-below via compare/min reductions. (B, 1) i32."""
    B = ys.shape[0]
    riota = lax.broadcasted_iota(jnp.int32, (B, BOARD_H), 1)
    limit = jnp.full((B, 1), BOARD_H, jnp.int32)
    for i in range(4):
        y = ys[:, i : i + 1]
        xc = jnp.clip(xs[:, i : i + 1], 0, BOARD_W - 1).astype(jnp.uint32)
        colbits = (rows >> xc) & jnp.uint32(1)           # (B, 20)
        below = (colbits == jnp.uint32(1)) & (riota > y)
        first = jnp.min(
            jnp.where(below, riota, BOARD_H), axis=1, keepdims=True
        )
        lim_i = jnp.where(
            first < BOARD_H, first - y - 1, BOARD_H - 1 - y
        )
        limit = jnp.minimum(limit, lim_i)
    return jnp.maximum(limit, 0)


# ---------------------------------------------------------------------------
# RNG (threefry on (B, 1) u32 — env/rng.py transcribed shape-polymorphically)
# ---------------------------------------------------------------------------

_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
_PARITY = 0x1BD11BDA


def _threefry(k0, k1, c0):
    """threefry2x32 lane 0 (env/rng.py `next_u32` draw), (B, 1) u32."""
    ks2 = k0 ^ k1 ^ jnp.uint32(_PARITY)
    ks = (k0, k1, ks2)
    x0 = c0 + k0
    x1 = jnp.zeros_like(c0) + k1
    for outer in range(5):
        rots = _ROT_A if outer % 2 == 0 else _ROT_B
        for r in rots:
            x0 = x0 + x1
            x1 = ((x1 << jnp.uint32(r)) | (x1 >> jnp.uint32(32 - r))) ^ x0
        x0 = x0 + ks[(outer + 1) % 3]
        x1 = x1 + ks[(outer + 2) % 3] + jnp.uint32(outer + 1)
    return x0


def _mod_const(word, m, pow16_mod):
    """word (B, 1) u32 mod m without integer division. pow16_mod must be
    2^16 % m. Reduce below 2^24 (f32-exact ints), one reciprocal multiply
    for an approximate quotient, then exact integer corrections."""
    hi = _i(word >> jnp.uint32(16))
    lo = _i(word & jnp.uint32(0xFFFF))
    v = hi * pow16_mod + lo                     # < 2^16 * pow16_mod + 2^16
    q = (v.astype(jnp.float32) * np.float32(1.0 / m)).astype(jnp.int32)
    r = v - q * m
    r = jnp.where(r < 0, r + m, r)
    r = jnp.where(r >= m, r - m, r)
    return r                                    # (B, 1) i32 in [0, m)


def _perm7_decode(r):
    """Lexicographic permutation #r of (0..6) — identical to
    `rng._PERM7[r]` (the table IS the lexicographic enumeration; the
    factorial number system picks the d-th smallest remaining element).
    r (B, 1) i32 in [0, 5040) -> bag (B, 7) i32."""
    B = r.shape[0]
    digits = []
    for f, top in zip(_FACT, (6, 5, 4, 3, 2)):
        d = jnp.zeros((B, 1), jnp.int32)
        for k in range(1, top + 1):
            d = d + (r >= f * k).astype(jnp.int32)
        r = r - d * f
        digits.append(d)
    digits.append(r)  # last digit = remainder (place value 1)
    digits.append(jnp.zeros((B, 1), jnp.int32))

    avail = jnp.ones((B, 7), jnp.int32)
    cols = []
    for d in digits:
        # exclusive prefix count of available elements
        parts = [jnp.zeros((B, 1), jnp.int32)]
        run = avail[:, 0:1]
        for j in range(1, 7):
            parts.append(run)
            run = run + avail[:, j : j + 1]
        ce = jnp.concatenate(parts, axis=1)      # (B, 7)
        pick = (avail != 0) & (ce == d)          # exactly one lane
        elem = jnp.sum(
            jnp.where(pick, lax.broadcasted_iota(jnp.int32, (B, 7), 1), 0),
            axis=1,
            keepdims=True,
        )
        avail = avail - pick.astype(jnp.int32)
        cols.append(elem)
    return jnp.concatenate(cols, axis=1)


def packed_obs(env):
    """`engine.pack_obs` on a packed state: bits 0-9 locked row, bits 10-19
    piece row. env (B, 44) u32 -> (B, 20) u32."""
    rows = env[:, 0:20]
    piece = _i(env[:, 20:21])
    rot = _i(env[:, 21:22])
    px = _i(env[:, 22:23])
    py = _i(env[:, 23:24])
    ys, xs = _abs_cells(_cells(piece * 4 + rot), px, py)
    return rows | (_prow(ys, xs) << jnp.uint32(10))


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------

def _draw_piece(bag, bag_pos, k0, k1, ctr, randomizer, predrawn=None):
    """`engine._draw_piece` on columns: returns (piece, bag, bag_pos, ctr).
    The refill draw always runs; ctr advances only when taken — the draw
    sequence is bit-exact vs the engine/oracle. `predrawn` optionally
    supplies this state's draw products (from `predraw`) so siblings
    stepped from ONE parent share the threefry + decode work (the draw
    depends only on (k0, k1, ctr), which all 7 children inherit)."""
    if predrawn is None:
        predrawn = predraw(k0, k1, ctr, randomizer)
    if randomizer == 1:
        return predrawn, bag, bag_pos, ctr + jnp.uint32(1)

    new_bag = predrawn
    need = (bag_pos >= 7).astype(jnp.int32)
    m7 = _mask(need, 7)
    bag = jnp.where(m7, new_bag, bag)
    pos = jnp.where(need != 0, 0, bag_pos)
    ctr = jnp.where(need != 0, ctr + jnp.uint32(1), ctr)
    B = bag.shape[0]
    a7 = lax.broadcasted_iota(jnp.int32, (B, 7), 1)
    piece = jnp.sum(jnp.where(a7 == pos, bag, 0), axis=1, keepdims=True)
    return piece, bag, pos + 1, ctr


def predraw(k0, k1, ctr, randomizer):
    """This state's piece-draw products: the uniform piece id, or the decoded
    refill bag — a function of (k0, k1, ctr) only, so all 7 children of one
    parent share it (`packed_step(..., predrawn=...)`)."""
    word = _threefry(k0, k1, ctr)
    if randomizer == 1:
        return _mod_const(word, 7, (1 << 16) % 7)
    return _perm7_decode(_mod_const(word, 5040, (1 << 16) % 5040))


def packed_step(env, act, *, actions_per_drop=1, scoring=0, randomizer=0,
                predrawn=None):
    """`engine.step` on packed states. env (B, 44) u32 (`engine.pack_state`
    layout), act (B, 1) i32. Returns the stepped (B, 44) u32. No-op on ended
    games; bit-exact vs engine.step (fuzz-tested). `predrawn` (from
    `predraw` on THIS state's k0/k1/ctr) shares the spawn-draw work across
    sibling steps."""
    B = env.shape[0]
    rows = env[:, 0:20]
    piece = _i(env[:, 20:21])
    rot = _i(env[:, 21:22])
    px = _i(env[:, 22:23])
    py = _i(env[:, 23:24])
    bag = _i(env[:, 24:31])
    bag_pos = _i(env[:, 31:32])
    k0 = env[:, 32:33]
    k1 = env[:, 33:34]
    ctr = env[:, 34:35]
    gravity = _i(env[:, 35:36])
    score = _i(env[:, 36:37])
    combo = _i(env[:, 37:38])
    lines = _i(env[:, 38:39])
    line_stats = _i(env[:, 39:43])
    end = _i(env[:, 43:44])

    # ---- lateral effect (engine._step_alive) ------------------------------
    dx = jnp.where(act == 1, -1, jnp.where(act == 2, 1, 0))
    drot = jnp.where(act == 4, 1, jnp.where(act == 5, 3, 0))
    npx = px + dx
    nrot = (rot + drot) & 3
    cells_old = _cells(piece * 4 + rot)
    cells_cand = _cells(piece * 4 + nrot)
    cys, cxs = _abs_cells(cells_cand, npx, py)
    blocked = _collides(rows, cys, cxs)
    px = jnp.where(blocked != 0, px, npx)
    rot = jnp.where(blocked != 0, rot, nrot)
    bm = _mask(1 - blocked, 4)
    cur_dy = jnp.where(bm, cells_cand[0], cells_old[0])
    cur_dx = jnp.where(bm, cells_cand[1], cells_old[1])

    # ---- vertical effect --------------------------------------------------
    hard = (act == 6).astype(jnp.int32)
    soft = (act == 3).astype(jnp.int32)
    lateral = (1 - hard) * (1 - soft)
    g_next = gravity + 1
    if actions_per_drop <= 0:  # auto-gravity OFF (engine._step_alive gate)
        grav_fires = jnp.zeros_like(lateral)
        g_keep = jnp.zeros_like(g_next)
    else:
        grav_fires = lateral * (g_next >= actions_per_drop).astype(jnp.int32)
        g_keep = g_next
    ys, xs = _abs_cells((cur_dy, cur_dx), px, py)
    md = _max_drop(rows, ys, xs)

    want_down = jnp.maximum(soft, grav_fires)
    drop_n = jnp.where(
        hard != 0, md, jnp.where(want_down != 0, jnp.minimum(md, 1), 0)
    )
    lock_now = jnp.maximum(hard, want_down * (md == 0).astype(jnp.int32))
    py = py + drop_n
    if scoring == 0:  # guideline drop points (engine._step_alive)
        score = score + jnp.where(
            hard != 0, 2 * md, jnp.where(soft != 0, jnp.minimum(md, 1), 0)
        )
    gravity = jnp.where(
        (hard | soft | grav_fires) != 0, 0, g_keep
    )

    # ---- lock + clear + spawn (engine._lock; both branches run) -----------
    lys = ys + drop_n  # cells at the locked position
    merged = rows | _prow(lys, xs)
    full = merged == jnp.uint32(FULL_ROW)                 # (B, 20) bool
    notfull = 1 - full.astype(jnp.int32)
    # below[r] = # non-full rows strictly below r: unrolled suffix sum
    # over the 20 row columns (scalar slices — no array constants)
    bcols = [jnp.zeros((B, 1), jnp.int32)]
    run = notfull[:, BOARD_H - 1 :]
    for r in range(BOARD_H - 2, -1, -1):
        bcols.append(run)
        run = run + notfull[:, r : r + 1]
    below = jnp.concatenate(bcols[::-1], axis=1)          # (B, 20)
    dst = jnp.int32(BOARD_H - 1) - below
    keep = jnp.where(full, jnp.uint32(0), merged)
    riota = lax.broadcasted_iota(jnp.int32, (B, BOARD_H), 1)
    cleared_rows = jnp.zeros((B, BOARD_H), jnp.uint32)
    for r in range(BOARD_H):
        cleared_rows = cleared_rows | jnp.where(
            riota == dst[:, r : r + 1], keep[:, r : r + 1], jnp.uint32(0)
        )
    n = jnp.sum(full.astype(jnp.int32), axis=1, keepdims=True)  # (B, 1)
    cleared = (n > 0).astype(jnp.int32)

    if scoring == 0:
        base = jnp.zeros((B, 1), jnp.int32)
        for k in range(1, 5):
            base = base + jnp.where(n == k, int(CLEAR_SCORE[k]), 0)
        gained = jnp.where(cleared != 0, base + COMBO_SCORE * combo, 0)
    else:
        gained = n
    l_score = score + gained
    l_combo = jnp.where(cleared != 0, combo + 1, 0)
    l_lines = lines + n
    s4 = lax.broadcasted_iota(jnp.int32, (B, 4), 1)
    l_stats = line_stats + jnp.where(
        (s4 == n - 1) & _mask(cleared, 4), 1, 0
    )

    # spawn on the post-clear board
    l_piece, l_bag, l_bag_pos, l_ctr = _draw_piece(
        bag, bag_pos, k0, k1, ctr, randomizer, predrawn
    )
    sys_, sxs_ = _abs_cells(
        _cells_spawn(l_piece), jnp.full((B, 1), SPAWN_X, jnp.int32),
        jnp.full((B, 1), SPAWN_Y, jnp.int32),
    )
    dead = _collides(cleared_rows, sys_, sxs_)
    l_end = end | dead

    # ---- merge lock / no-lock, then the end guard -------------------------
    def out(rows_, piece_, rot_, px_, py_, bag_, bag_pos_, ctr_, gravity_,
            score_, combo_, lines_, stats_, end_):
        return jnp.concatenate(
            [rows_, _u(piece_), _u(rot_), _u(px_), _u(py_), _u(bag_),
             _u(bag_pos_), k0, k1, ctr_, _u(gravity_), _u(score_),
             _u(combo_), _u(lines_), _u(stats_), _u(end_)],
            axis=1,
        )

    locked = out(
        cleared_rows, l_piece, jnp.zeros((B, 1), jnp.int32),
        jnp.full((B, 1), SPAWN_X, jnp.int32),
        jnp.full((B, 1), SPAWN_Y, jnp.int32),
        l_bag, l_bag_pos, l_ctr, jnp.zeros((B, 1), jnp.int32),
        l_score, l_combo, l_lines, l_stats, l_end,
    )
    unlocked = out(
        rows, piece, rot, px, py, bag, bag_pos, ctr, gravity,
        score, combo, lines, line_stats, end,
    )
    stepped = jnp.where(_mask(lock_now, env.shape[1]), locked, unlocked)
    return jnp.where(_mask(end, env.shape[1]), env, stepped)
