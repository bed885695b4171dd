"""Chained multi-state search over the whole gif under gravity hypotheses.

Carries the full set of RULES.md-simulator states consistent with each frame
(g counter and post-lock ambiguity included) across gaps; a hypothesis about
gravity semantics survives only if every one of the 199 transitions is
reachable. Pins actions-per-drop / gravity coupling externally.
"""
import numpy as np
from collections import deque
import search_transitions as st

H, W = 22, 10
CELLS = st.CELLS

def step_h(state, a, apd, next_pids):
    """apd=0 means no auto-gravity. Returns list of successor states."""
    rows, pid, r, py, px, g = state
    collides, lock = st.collides, st.lock
    def finish(rows, pid, r, py, px, g):
        if apd and a != 3 and a != 6:
            g += 1
            if g >= apd:
                if collides(rows, pid, r, py+1, px):
                    return ('LOCK', rows, pid, r, py, px)
                return (rows, pid, r, py+1, px, 0)
        return (rows, pid, r, py, px, g)
    if a == 0:
        out = finish(rows, pid, r, py, px, g)
    elif a in (1,2):
        nx = px + (1 if a == 2 else -1)
        if not collides(rows, pid, r, py, nx): px = nx
        out = finish(rows, pid, r, py, px, g)
    elif a in (4,5):
        nr = (r + (1 if a == 4 else 3)) % 4
        if not collides(rows, pid, nr, py, px): r = nr
        out = finish(rows, pid, r, py, px, g)
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
        outs = []
        for np_ in next_pids:
            if not collides(rows, np_, 0, 0, 3):
                outs.append((rows, np_, 0, 0, 3, 0))
        return outs
    return [out]

def render_key(state):
    rows, pid, r, py, px = state[:5]
    return rows, frozenset((py+dy, px+dx) for (dy,dx) in CELLS[(pid,r)])

def chain(apd, maxdepth=6, verbose=False):
    grids = np.load('grids.npy')
    parsed = [st.parse(g) for g in grids]
    # initial state set: all candidate poses for frame 0, any g in range
    rows0, pc0 = parsed[0]
    gs = range(1) if apd == 0 else range(apd)
    S = {(rows0, pid, r, py, px, g)
         for (pid, r, py, px) in st.candidates(pc0) for g in gs}
    depth_needed = []
    for k in range(len(grids)-1):
        rows1, pc1 = parsed[k+1]
        tkey = (rows1, pc1)
        next_pids = sorted({pid for (pid,_,_,_) in st.candidates(pc1)})
        found = set()
        dmin = None
        q = deque((s, 0) for s in S)
        seen = set(S)
        while q:
            cur, d = q.popleft()
            if d >= maxdepth: continue
            for a in range(7):
                for ns in step_h(cur, a, apd, next_pids):
                    if render_key(ns) == tkey:
                        found.add(ns)
                        if dmin is None: dmin = d+1
                    if ns not in seen and d+1 < maxdepth:
                        seen.add(ns); q.append((ns, d+1))
        if not found:
            print(f"apd={apd}: DEAD at gap {k}->{k+1}")
            return False, k
        depth_needed.append(dmin)
        S = found
    import collections
    print(f"apd={apd}: ALL {len(grids)-1} gaps OK; min-depth hist {dict(sorted(collections.Counter(depth_needed).items()))}")
    return True, None

if __name__ == '__main__':
    import sys
    for apd in [int(x) for x in sys.argv[1:]] or [0,1,2,3]:
        chain(apd)
