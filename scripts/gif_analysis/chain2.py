import numpy as np, collections
from collections import deque
import search_transitions as st
import chain_search as cs

def chain(apd, verbose=True):
    grids = np.load('grids.npy')
    parsed = [st.parse(g) for g in grids]
    rows0, pc0 = parsed[0]
    gs = range(1) if apd == 0 else range(apd)
    S = {(rows0, pid, r, py, px, g)
         for (pid, r, py, px) in st.candidates(pc0) for g in gs}
    depth_needed = []
    for k in range(len(grids)-1):
        rows1, pc1 = parsed[k+1]
        tkey = (rows1, pc1)
        next_pids = sorted({pid for (pid,_,_,_) in st.candidates(pc1)})
        found, dmin = set(), None
        for maxdepth in (6, 9, 12):
            q = deque((s, 0) for s in S)
            seen = set(S)
            while q:
                cur, d = q.popleft()
                if d >= maxdepth: continue
                for a in range(7):
                    for ns in cs.step_h(cur, a, apd, next_pids):
                        if cs.render_key(ns) == tkey:
                            found.add(ns)
                            if dmin is None: dmin = d+1
                        if ns not in seen and d+1 < maxdepth:
                            seen.add(ns); q.append((ns, d+1))
            if found: break
        if not found:
            print(f"apd={apd}: DEAD at gap {k}->{k+1} (exhausted depth 12)", flush=True)
            return False
        depth_needed.append(dmin)
        S = found
    print(f"apd={apd}: ALL {len(grids)-1} gaps OK; min-depth hist {dict(sorted(collections.Counter(depth_needed).items()))}", flush=True)
    return True

import sys
for apd in [int(x) for x in sys.argv[1:]]:
    chain(apd)
