"""Cut the verified gif action chain into 20-row-board replay units.

A unit is a contiguous run of actions whose full trajectory (stack + piece
cells) stays within rows 2..21 of the 22-row demo board, so it shifts
verbatim onto the 20x10 board (movement/rotation/collision/lock/clear are
translation-invariant; the shift only re-labels rows). Units break at locks
(the respawn happens 2 rows above the 20-row frame) and resume once the new
piece is fully inside rows >= 2. Saved pre-shifted for tests/test_gif_trace.py.
"""
import numpy as np
import search_transitions as st
import chain_search as cs

grids = np.load('grids.npy')
parsed = [st.parse(g) for g in grids]
d = np.load('/root/repo/tests/data/gif_trace.npz')

def cells_min_max(stt):
    rows, pid, r, py, px, g = stt
    ys = [py + dy for (dy, dx) in st.CELLS[(pid, r)]]
    return min(ys), max(ys)

def stack_ok(rows):
    return rows[0] == 0 and rows[1] == 0

units = []  # dicts
cur = (parsed[0][0],) + tuple(d['poses'][0].tolist()) + (0,)
pending = None  # open unit: dict(start=state, seq=[])
skipped_actions = 0

def close(expected_state=None, lock_stack=None, cleared=0):
    global pending
    if pending and pending['seq']:
        u = pending
        u['type'] = 0 if lock_stack is None else 1
        u['end'] = expected_state
        u['lock_stack'] = lock_stack
        u['cleared'] = cleared
        units.append(u)
    pending = None

for k in range(199):
    o, L = int(d['off'][k]), int(d['length'][k])
    seq = d['seq'][o:o+L].tolist()
    next_pids = sorted({p for (p, _, _, _) in st.candidates(parsed[k+1][1])})
    for i, a in enumerate(seq):
        outs = cs.step_h(cur, a, 0, next_pids)
        if i == len(seq) - 1:
            match = [x for x in outs if cs.render_key(x) == (parsed[k+1][0], parsed[k+1][1])]
            nxt = match[0]
        else:
            assert len(outs) == 1
            nxt = outs[0]
        locked = nxt[0] != cur[0] or nxt[1] != cur[1]  # stack or piece changed
        in_board = cells_min_max(cur)[0] >= 2 and stack_ok(cur[0])
        if locked:
            # locking action: include if the pre-lock pose is in-board (the
            # locked cells only go DOWN; post-clear stack verified below)
            if in_board and stack_ok(nxt[0]) and pending is None:
                pending = {'start': cur, 'seq': []}
            if in_board and stack_ok(nxt[0]) and pending is not None:
                pending['seq'].append(a)
                n_cleared = (sum(1 for x in cur[0] if x == (1 << 10) - 1))
                # cleared count: full rows of merged stack = lines delta
                merged_full = None
                close(expected_state=None, lock_stack=nxt[0],
                      cleared=-1)  # cleared recomputed in test via row count
            else:
                skipped_actions += 1
                close()  # abandon open unit (shouldn't happen: locks go down)
        else:
            now_ok = in_board and cells_min_max(nxt)[0] >= 2 and stack_ok(nxt[0])
            if now_ok:
                if pending is None:
                    pending = {'start': cur, 'seq': []}
                pending['seq'].append(a)
            else:
                skipped_actions += 1
                close(expected_state=cur if pending and pending['seq'] else None)
        cur = nxt
    # close at frame boundary with the DECODED FRAME as expected end
    if pending and pending['seq']:
        close(expected_state=cur)

print("units:", len(units), "skipped actions:", skipped_actions,
      "total unit actions:", sum(len(u['seq']) for u in units))

# pack, shifting rows up by 2 (drop rows 0-1, append empty rows at bottom? NO:
# shift means row r of 22-board -> row r-2 of 20-board; stack rows 2..21 -> 0..19)
U = len(units)
u_rows = np.zeros((U, 20), np.uint32)
u_end_rows = np.zeros((U, 20), np.uint32)
u_pose = np.zeros((U, 4), np.int32)
u_end_pose = np.zeros((U, 4), np.int32)
u_type = np.zeros(U, np.int8)
seq_flat, offs, lens = [], [], []
for j, u in enumerate(units):
    rows, pid, r, py, px, g = u['start']
    u_rows[j] = rows[2:]
    u_pose[j] = (pid, r, py - 2, px)
    u_type[j] = u['type']
    offs.append(len(seq_flat)); lens.append(len(u['seq'])); seq_flat.extend(u['seq'])
    if u['type'] == 1:
        u_end_rows[j] = u['lock_stack'][2:]
    else:
        erows, epid, er, epy, epx, eg = u['end']
        u_end_rows[j] = erows[2:]
        u_end_pose[j] = (epid, er, epy - 2, epx)

np.savez_compressed(
    '/root/repo/tests/data/gif_trace.npz',
    grids=grids.astype(np.int8),
    u_rows=u_rows, u_pose=u_pose, u_end_rows=u_end_rows,
    u_end_pose=u_end_pose, u_type=u_type,
    u_seq=np.asarray(seq_flat, np.int32),
    u_off=np.asarray(offs, np.int32), u_len=np.asarray(lens, np.int32),
)
print("saved", U, "units")
