"""Extract ONE consistent (pose, action-seq) chain through all 199 gif gaps
under gravity-off RULES.md semantics, and save it as the checked-in test
artifact (tests/data/gif_trace.npz)."""
import numpy as np
from collections import deque
import search_transitions as st
import chain_search as cs

grids = np.load('grids.npy')
parsed = [st.parse(g) for g in grids]
APD = 0

rows0, pc0 = parsed[0]
S = {(rows0, pid, r, py, px, 0) for (pid, r, py, px) in st.candidates(pc0)}
gap_bp = []  # per gap: dict end_state -> (prev_state, seq)
for k in range(len(grids) - 1):
    rows1, pc1 = parsed[k + 1]
    tkey = (rows1, pc1)
    next_pids = sorted({pid for (pid, _, _, _) in st.candidates(pc1)})
    bp = {}
    for maxdepth in (6, 9, 12):
        q = deque((s, (), s) for s in S)  # (state, seq, origin)
        seen = set(S)
        while q:
            cur, seq, origin = q.popleft()
            if len(seq) >= maxdepth: continue
            for a in range(7):
                for ns in cs.step_h(cur, a, APD, next_pids):
                    if cs.render_key(ns) == tkey and ns not in bp:
                        bp[ns] = (origin, seq + (a,))
                    if ns not in seen and len(seq) + 1 < maxdepth:
                        seen.add(ns); q.append((ns, seq + (a,), origin))
        if bp: break
    assert bp, f"gap {k} unreachable"
    gap_bp.append(bp)
    S = set(bp.keys())

# walk back to extract one chain
state = next(iter(S))
chain = []
for k in range(len(gap_bp) - 1, -1, -1):
    origin, seq = gap_bp[k][state]
    chain.append((origin, seq))
    state = origin
chain.reverse()

# flatten: per gap start pose + seq; verify by forward replay
poses, seqs, offs, lens = [], [], [], []
for k, (start, seq) in enumerate(chain):
    rows, pid, r, py, px, g = start
    assert rows == parsed[k][0] and g == 0
    # verify replay: apply seq, check render (incl. spawn piece forcing)
    cur = start
    next_pids = sorted({p for (p, _, _, _) in st.candidates(parsed[k+1][1])})
    for i, a in enumerate(seq):
        outs = cs.step_h(cur, a, APD, next_pids)
        if i == len(seq) - 1:
            match = [o for o in outs if cs.render_key(o) == (parsed[k+1][0], parsed[k+1][1])]
            assert match, f"replay mismatch gap {k}"
            cur = match[0]
        else:
            assert len(outs) == 1, f"unexpected midway lock gap {k} step {i}"
            cur = outs[0]
    poses.append((pid, r, py, px))
    offs.append(len(seqs)); lens.append(len(seq)); seqs.extend(seq)

np.savez_compressed(
    '/root/repo/tests/data/gif_trace.npz',
    grids=grids.astype(np.int8),
    poses=np.asarray(poses, np.int32),
    seq=np.asarray(seqs, np.int32),
    off=np.asarray(offs, np.int32),
    length=np.asarray(lens, np.int32),
)
print("chain extracted:", len(chain), "gaps; total actions:", len(seqs))
