"""Tetromino tables (see RULES.md "Pieces").

Seven pieces, four box-spin rotations each, cells given as (row, col) offsets
inside a 4x4 box. Tables are built once at import with numpy and embedded into
jitted programs as constants.

Reference contract: 7 actions / 7-piece queue (`/root/reference/agents/core.py:10`,
`/root/reference/model/model.py:9`); rule details are fixed by RULES.md, not by
the (unavailable) pyTetris source.
"""

import numpy as np

N_PIECES = 7
N_ROT = 4
BOX = 4

# Base orientations inside the 4x4 box (RULES.md table).
_BASE_CELLS = {
    0: [(1, 0), (1, 1), (1, 2), (1, 3)],  # I
    1: [(1, 1), (1, 2), (2, 1), (2, 2)],  # O
    2: [(1, 0), (1, 1), (1, 2), (2, 1)],  # T
    3: [(1, 1), (1, 2), (2, 0), (2, 1)],  # S
    4: [(1, 0), (1, 1), (2, 1), (2, 2)],  # Z
    5: [(1, 0), (1, 1), (1, 2), (2, 2)],  # J
    6: [(1, 0), (1, 1), (1, 2), (2, 0)],  # L
}


def _build_cells() -> np.ndarray:
    """PIECE_CELLS[piece, rot, 4, 2] int32: (dy, dx) offsets, sorted (dy, dx)."""
    out = np.zeros((N_PIECES, N_ROT, 4, 2), dtype=np.int32)
    for p, cells in _BASE_CELLS.items():
        box = np.zeros((BOX, BOX), dtype=np.int8)
        for (r, c) in cells:
            box[r, c] = 1
        for rot in range(N_ROT):
            rbox = np.rot90(box, k=rot)  # k>0 is counter-clockwise
            ys, xs = np.nonzero(rbox)
            order = np.lexsort((xs, ys))
            out[p, rot, :, 0] = ys[order]
            out[p, rot, :, 1] = xs[order]
    return out


PIECE_CELLS = _build_cells()

SPAWN_X = 3
SPAWN_Y = 0

BOARD_H = 20
BOARD_W = 10
FULL_ROW = (1 << BOARD_W) - 1  # 0x3FF

# Guideline line-clear base scores for 0..4 cleared rows (RULES.md "Locking").
CLEAR_SCORE = np.array([0, 100, 300, 500, 800], dtype=np.int32)
COMBO_SCORE = 50
