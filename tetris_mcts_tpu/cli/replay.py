"""`replay` entrypoint — step through saved self-play games (the reference's
Tk viewer, `/root/reference/tools/replay.py`, as a terminal renderer — this
environment is headless). Optional `--model` re-runs the current VV net on
every frame and prints value/variance next to the stored search statistics
(the reference's live re-inference panel, `tools/replay.py:126-143`).

Keys: Enter/n = next, p = prev, j <n> = jump, q = quit. `--dump` writes the
whole episode as text frames instead of stepping; `--gif PATH` renders the
episode to an animated GIF via PIL (the capture-tool capability,
`tools/capture.py:1-57` — greyscale cells on a scaled grid).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

_CHARS = {0: "·", 1: "█", -1: "▒"}


def render(board, score, lines, combo, value=None, variance=None,
           policy=None, action=None):
    out = []
    out.append("┌" + "─" * 20 + "┐")
    for r in range(20):
        out.append("│" + "".join(_CHARS[int(v)] * 2 for v in board[r]) + "│")
    out.append("└" + "─" * 20 + "┘")
    out.append(f"score {score}   lines {lines}   combo {combo}")
    if action is not None:
        names = ["noop", "left", "right", "soft", "ccw", "cw", "hard"]
        out.append(f"action: {names[int(action)]}")
    if policy is not None:
        out.append("policy: " + " ".join(f"{p:.2f}" for p in policy))
    if value is not None:
        out.append(f"stored value {value:.2f}  variance {variance:.2f}")
    return "\n".join(out)


def write_gif(boards, path, scale: int = 20, duration_ms: int = 80):
    """Render int8 (T, 20, 10) getState boards to an animated GIF — the
    reference's frame capturer (`tools/capture.py:1-57`: greyscale, white
    background, dark locked cells, mid-grey falling piece) without its
    memmap polling loop (frames come from the saved episode)."""
    from PIL import Image

    boards = np.asarray(boards)
    # 0 empty -> white, 1 locked -> near-black, -1 piece -> mid grey
    shade = np.where(boards == 1, 40, np.where(boards == -1, 128, 255))
    big = np.kron(shade.astype(np.uint8), np.ones((scale, scale), np.uint8))
    frames = [Image.fromarray(b, mode="L") for b in big]
    frames[0].save(
        path, save_all=True, append_images=frames[1:],
        duration=duration_ms, loop=0,
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="tetris-tpu replay")
    p.add_argument("data", help="DataSaver .h5 file (or glob)")
    p.add_argument("--episode", type=int, default=None,
                   help="episode id to view (default: first in file)")
    p.add_argument("--model", default="",
                   help="checkpoint to re-run on each frame")
    p.add_argument("--model_type", default="vv", choices=("vv", "vp"),
                   help="net the checkpoint holds: vv prints re-inferred "
                        "value/variance, vp value/policy (the reference's "
                        "(v, p) re-inference panel, tools/replay.py:126-143)")
    p.add_argument("--dump", action="store_true",
                   help="print all frames non-interactively")
    p.add_argument("--gif", default="",
                   help="render the episode to this animated-GIF path "
                        "(tools/capture.py capability)")
    p.add_argument("--gif_scale", type=int, default=20,
                   help="pixels per cell in --gif (capture.py scale)")
    p.add_argument("--gif_ms", type=int, default=80,
                   help="frame duration in ms for --gif")
    args = p.parse_args(argv)

    from tetris_mcts_tpu.utils.data import DataLoader

    loader = DataLoader(args.data)
    ep = args.episode if args.episode is not None else int(loader.episode[0])
    sel = np.nonzero(loader.episode == ep)[0]
    if len(sel) == 0:
        print(f"episode {ep} not found; available: "
              f"{sorted(set(loader.episode.tolist()))[:20]}...", file=sys.stderr)
        return 1

    model = None
    if args.model:
        from tetris_mcts_tpu.train.trainer import VPModel, VVModel

        cls = VPModel if args.model_type == "vp" else VVModel
        model = cls(checkpoint_path=args.model)
        model.load()

    def frame(i):
        j = sel[i]
        txt = render(
            loader.board[j], int(loader.score[j]), int(loader.lines[j]),
            int(loader.combo[j]), float(loader.value[j]),
            float(loader.variance[j]), loader.policy[j], loader.action[j],
        )
        if model is not None:
            if args.model_type == "vp":
                v, pol = model.inference(loader.board[j][None])
                txt += (
                    f"\nmodel value {float(v[0, 0]):.2f}  policy "
                    + " ".join(f"{q:.2f}" for q in np.asarray(pol)[0])
                )
            else:
                v, var = model.inference(loader.board[j][None])
                txt += (f"\nmodel value {float(v[0, 0]):.2f}  "
                        f"variance {float(var[0, 0]):.2f}")
        return f"frame {i + 1}/{len(sel)} (episode {ep})\n" + txt

    if args.gif:
        write_gif(loader.board[sel], args.gif, scale=args.gif_scale,
                  duration_ms=args.gif_ms)
        print(f"wrote {len(sel)} frames to {args.gif}")
        return 0

    if args.dump:
        for i in range(len(sel)):
            print(frame(i))
            print()
        return 0

    i = 0
    while True:
        print("\033[2J\033[H" + frame(i), flush=True)
        try:
            cmd = input("[n]ext/[p]rev/j <i>/[q]uit> ").strip()
        except EOFError:
            break
        if cmd in ("q", "quit"):
            break
        elif cmd in ("p", "prev"):
            i = max(i - 1, 0)
        elif cmd.startswith("j"):
            try:
                i = min(max(int(cmd.split()[1]) - 1, 0), len(sel) - 1)
            except (IndexError, ValueError):
                pass
        else:
            i = min(i + 1, len(sel) - 1)
    return 0


if __name__ == "__main__":
    sys.exit(main() or 0)
