"""Decode /root/reference/demo/test.gif into grids.npy for the chain search.

The gif is rendered by the reference's tools/capture.py: scale=20, the board
origin at pixel (10, 10), each 22x10 cell filled 255 (stack), 0 (empty) or
122 (current piece), with 1-px black grid lines on the cell boundaries.
Sampling the cell CENTERS avoids the grid lines; thresholds absorb any gif
palette quantization. Output grid encoding matches search_transitions.parse:
1 = stack, -1 = current piece, 0 = empty.
"""
import os

import numpy as np
from PIL import Image

GIF = "/root/reference/demo/test.gif"
SCALE = 20
H, W = 22, 10

im = Image.open(GIF)
grids = np.zeros((im.n_frames, H, W), np.int8)
for k in range(im.n_frames):
    im.seek(k)
    px = np.asarray(im.convert("L"))
    for i in range(H):
        for j in range(W):
            v = px[SCALE // 2 + i * SCALE + SCALE // 2,
                   SCALE // 2 + j * SCALE + SCALE // 2]
            grids[k, i, j] = 1 if v > 200 else (0 if v < 60 else -1)

out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "grids.npy")
np.save(out, grids)
print(f"{im.n_frames} frames -> {out}; "
      f"stack cells {int((grids == 1).sum())}, piece cells "
      f"{int((grids == -1).sum())} ({(grids == -1).sum() / im.n_frames:.2f}/frame)")
