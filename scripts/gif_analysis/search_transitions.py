"""Search RULES.md action sequences reproducing each gif frame transition.

The gif (reference demo/test.gif) is a 0.5s-poll recording of a 22x10-board
game (reference tools/capture.py reads the 220-byte board_output stream), so a
frame gap may span several actions and at most a lock+respawn. This script
replays the frames with a scalar RULES.md simulator (22 rows) and BFS over
action sequences; at locks the spawned piece is forced to the next frame's
observed piece id.
"""
import numpy as np, pickle
from collections import deque

H, W = 22, 10
FULL = (1 << W) - 1
BASE = {
 0: [(1,0),(1,1),(1,2),(1,3)], 1: [(1,1),(1,2),(2,1),(2,2)],
 2: [(1,0),(1,1),(1,2),(2,1)], 3: [(1,1),(1,2),(2,0),(2,1)],
 4: [(1,0),(1,1),(2,1),(2,2)], 5: [(1,0),(1,1),(1,2),(2,2)],
 6: [(1,0),(1,1),(1,2),(2,0)],
}
def rot_cells(pid, r):
    box = np.zeros((4,4), np.int8)
    for (y,x) in BASE[pid]: box[y,x] = 1
    return tuple(map(tuple, np.argwhere(np.rot90(box, k=r)).tolist()))
CELLS = {(p,r): rot_cells(p,r) for p in range(7) for r in range(4)}

def collides(rows, pid, r, py, px):
    for (dy,dx) in CELLS[(pid,r)]:
        y, x = py+dy, px+dx
        if x < 0 or x >= W or y < 0 or y >= H: return True
        if rows[y] >> x & 1: return True
    return False

def lock(rows, pid, r, py, px):
    rows = list(rows)
    for (dy,dx) in CELLS[(pid,r)]:
        rows[py+dy] |= 1 << (px+dx)
    kept = [row for row in rows if row != FULL]
    n = H - len(kept)
    return tuple([0]*n + kept), n

SPAWN = (0, 3)  # py, px per RULES.md

def step(state, a, apd=1, next_pid=None):
    """state=(rows,pid,r,py,px,g,locked_flag). Returns new state or None if
    this action needs a spawn but next_pid is None (gap can't support it)."""
    rows, pid, r, py, px, g = state
    def grav(rows, pid, r, py, px, g):
        g += 1
        if g >= apd:
            if collides(rows, pid, r, py+1, px):
                return ('LOCK', rows, pid, r, py, px)
            return (rows, pid, r, py+1, px, 0)
        return (rows, pid, r, py, px, g)
    if a == 0:
        out = grav(rows, pid, r, py, px, g)
    elif a in (1,2):
        nx = px + (1 if a == 2 else -1)
        if not collides(rows, pid, r, py, nx): px = nx
        out = grav(rows, pid, r, py, px, g)
    elif a in (4,5):
        nr = (r + (1 if a == 4 else 3)) % 4
        if not collides(rows, pid, nr, py, px): r = nr
        out = grav(rows, pid, r, py, px, g)
    elif a == 3:
        if collides(rows, pid, r, py+1, px):
            out = ('LOCK', rows, pid, r, py, px)
        else:
            out = (rows, pid, r, py+1, px, 0)
    elif a == 6:
        while not collides(rows, pid, r, py+1, px): py += 1
        out = ('LOCK', rows, pid, r, py, px)
    if out[0] == 'LOCK':
        _, rows, pid, r, py, px = out
        rows, n = lock(rows, pid, r, py, px)
        if next_pid is None: return None
        spy, spx = SPAWN
        if collides(rows, next_pid, 0, spy, spx): return None  # game over: gif keeps going
        return (rows, next_pid, 0, spy, spx, 0)
    return out

def render_key(state):
    rows, pid, r, py, px = state[:5]
    pc = frozenset((py+dy, px+dx) for (dy,dx) in CELLS[(pid,r)])
    return rows, pc

def parse(grid):
    rows = tuple(int(sum((1 << x) for x in range(W) if grid[y,x] == 1)) for y in range(H))
    piece = frozenset(map(tuple, np.argwhere(grid == -1).tolist()))
    return rows, piece

def candidates(piece_cells):
    """All (pid,r,py,px) matching the observed piece cells."""
    ys = [c[0] for c in piece_cells]; xs = [c[1] for c in piece_cells]
    y0, x0 = min(ys), min(xs)
    out = []
    for pid in range(7):
        for r in range(4):
            cs = CELLS[(pid,r)]
            for py in range(y0-3, y0+1):
                for px in range(x0-3, x0+1):
                    if frozenset((py+dy, px+dx) for (dy,dx) in cs) == piece_cells:
                        out.append((pid, r, py, px))
    return out

def bfs(start, target_rows, target_piece, next_pids, apd=1, maxdepth=12):
    """BFS action sequences from start; target = (rows, piece cell set)."""
    tkey = (target_rows, target_piece)
    q = deque([(start, ())])
    seen = {start}
    while q:
        st, seq = q.popleft()
        if len(seq) >= maxdepth: continue
        for a in range(7):
            locked_next = None
            ns = step(st, a, apd=apd)
            if ns is None:
                # needs spawn: try each candidate next pid
                for np_ in next_pids:
                    ns2 = step(st, a, apd=apd, next_pid=np_)
                    if ns2 is not None and render_key(ns2) == tkey:
                        return seq + (a,)
                    if ns2 is not None and ns2 not in seen and len(seq)+1 < maxdepth:
                        seen.add(ns2); q.append((ns2, seq + (a,)))
                continue
            if render_key(ns) == tkey:
                return seq + (a,)
            if ns not in seen:
                seen.add(ns); q.append((ns, seq + (a,)))
    return None

def main(apd=1):
    grids = np.load('/root/repo/runs/gif/grids.npy')
    parsed = [parse(g) for g in grids]
    ok, fail = 0, []
    lens = []
    for k in range(len(grids)-1):
        rows0, pc0 = parsed[k]
        rows1, pc1 = parsed[k+1]
        cands0 = candidates(pc0)
        # sanity: piece cells must not overlap stack
        next_pids = sorted({pid for (pid,_,_,_) in candidates(pc1)})
        found = None
        for (pid, r, py, px) in cands0:
            start = (rows0, pid, r, py, px, 0)
            seq = bfs(start, rows1, pc1, next_pids, apd=apd)
            if seq is not None:
                found = (seq, (pid,r,py,px)); break
        if found:
            ok += 1; lens.append(len(found[0]))
        else:
            fail.append(k)
    print(f"apd={apd}: {ok}/{len(grids)-1} transitions reproduced")
    if lens:
        import collections
        print("seq-length histogram:", dict(sorted(collections.Counter(lens).items())))
    print("failed gaps:", fail[:20], "..." if len(fail) > 20 else "")
    return fail

if __name__ == '__main__':
    main(apd=1)
