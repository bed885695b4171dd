"""`tools` entrypoint — the reference's manual inspection scripts
(SURVEY.md §2.5 / §4) as subcommands:

  sanity           model sanity: param count, predictions on synthetic
                   boards, horizontal-flip-invariance RMSE
                   (reference tools/test.py:8-56)
  inference_speed  timed inference loop (tools/inference_speed.py:1-9)
  train_dump       re-train offline from a training-set dump
                   (tools/train_dump.py; dumps written by the online driver)
  print_dump_grad  inspect the grad-norm watchdog dump
                   (tools/print_dump_grad.py; written by VVModel.train_data)
  plot             export static SVG charts from metrics JSONL / loss HDF5
                   (the tools/plot_*.py + web/web.py capability)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _synthetic_boards(n=5, seed=0):
    """Stacks of random garbage rows, like the reference's handmade boards."""
    rng = np.random.RandomState(seed)
    boards = np.zeros((n, 20, 10), np.int8)
    for i in range(n):
        height = rng.randint(0, 12)
        for r in range(20 - height, 20):
            row = rng.randint(0, 2, 10)
            row[rng.randint(10)] = 0  # keep a hole: not a full line
            boards[i, r] = row
    return boards


def cmd_sanity(args):
    """Model sanity (reference tools/test.py for the VV net,
    tools/test_dist.py:10-34 for the C51 net): parameter count, predictions
    on synthetic boards, horizontal-flip invariance; the dist net also
    prints per-board distribution entropy, the vp net policy entropy."""
    from tetris_mcts_tpu.train.trainer import DistModel, VPModel, VVModel

    cls = {"vv": VVModel, "vp": VPModel, "dist": DistModel}[args.model]
    model = cls(checkpoint_path=args.checkpoint)
    model.load()
    n_params = sum(x.size for x in __import__("jax").tree.leaves(model.params))
    print(f"Parameters: {n_params}")

    boards = _synthetic_boards()
    flipped = np.ascontiguousarray(boards[:, :, ::-1])

    def entropy(p):
        return float(-np.sum(p * np.log(np.maximum(p, 1e-12))))

    if args.model == "dist":
        d = model.inference(boards)
        centers = (np.arange(d.shape[1]) + 0.5)
        for i in range(len(boards)):
            mean_bin = float((d[i] * centers).sum())
            print(f"board {i}: mean atom {mean_bin:7.2f}   "
                  f"entropy {entropy(d[i]):6.3f}")
        d2 = model.inference(flipped)
        rmse = float(np.sqrt(np.mean((d - d2) ** 2)))
        print(f"flip-invariance RMSE (distribution): {rmse:.6f}")
        return 0

    if args.model == "vp":
        v, pol = model.inference(boards)
        for i in range(len(boards)):
            print(f"board {i}: value {float(v[i, 0]):8.3f}   "
                  f"policy entropy {entropy(pol[i]):6.3f}")
        v2, _ = model.inference(flipped)
    else:
        v, var = model.inference(boards)
        for i in range(len(boards)):
            print(f"board {i}: value {float(v[i, 0]):8.3f}   "
                  f"variance {float(var[i, 0]):8.3f}")
        v2, _ = model.inference(flipped)

    # horizontal-flip invariance (reference tools/test.py:35-41): Tetris
    # values should be (approximately) mirror-invariant
    rmse = float(np.sqrt(np.mean((v - v2) ** 2)))
    print(f"flip-invariance RMSE: {rmse:.4f}")
    return 0


def cmd_inference_speed(args):
    from tetris_mcts_tpu.train.trainer import VVModel

    model = VVModel()
    boards = _synthetic_boards(args.batch)
    model.inference(boards)  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        model.inference(boards)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "iters": args.iters, "batch": args.batch, "seconds": round(dt, 3),
        "inferences_per_s": round(args.iters * args.batch / dt, 1),
    }))
    return 0


def cmd_train_dump(args):
    from tetris_mcts_tpu.train.trainer import VVModel

    blob = np.load(args.dump)
    model = VVModel(checkpoint_path=args.checkpoint)
    if args.load_model:
        model.load()
    data = [blob["states"], blob["values"], blob["variance"], blob["weights"]]
    model.train_data(
        data, batch_size=args.batch_size, iters_per_val=args.iters_per_val,
        max_iters=args.max_iters, shuffle=True,
    )
    # a reproducibility probe, not a trainer: saving is opt-in so one dump
    # session can never clobber a long-run checkpoint (the reference
    # tools/train_dump.py never saves)
    if args.save_model:
        model.save(verbose=True)
    return 0


def cmd_print_dump_grad(args):
    blob = np.load(args.dump)
    states = blob["states"]
    for i in range(len(states)):
        print(f"sample {i}: target value {float(blob['value'][i]):.3f} "
              f"variance {float(blob['variance'][i]):.3f} "
              f"weight {float(blob['weight'][i]):.3f} "
              f"pred value {float(blob['pred_value'][i]):.3f} "
              f"pred variance {float(blob['pred_variance'][i]):.3f}")
    return 0


def _svg_line(series, w=640, h=240, pad=36, colors=("#2a78d6", "#eb6834")):
    """Minimal static SVG line chart (single hue per series, 2px strokes)."""
    allv = [v for s in series for v in s if v is not None]
    if not allv:
        return "<svg/>"
    ymin, ymax = min(min(allv), 0), max(allv)
    nmax = max(max(len(s) for s in series) - 1, 1)
    X = lambda i: pad + (w - 2 * pad) * i / nmax
    Y = lambda v: h - pad - (h - 2 * pad) * (v - ymin) / (ymax - ymin or 1)
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
             f'style="background:#fcfcfb">']
    for f in (ymin, (ymin + ymax) / 2, ymax):
        parts.append(f'<line x1="{pad}" x2="{w - pad}" y1="{Y(f):.1f}" '
                     f'y2="{Y(f):.1f}" stroke="#e3e2dd"/>')
        parts.append(f'<text x="2" y="{Y(f) + 3:.1f}" font-size="10" '
                     f'fill="#52514e">{f:.3g}</text>')
    for k, s in enumerate(series):
        pts = " ".join(f"{X(i):.1f},{Y(v):.1f}" for i, v in enumerate(s))
        parts.append(f'<polyline points="{pts}" fill="none" '
                     f'stroke="{colors[k % len(colors)]}" stroke-width="2"/>')
    parts.append("</svg>")
    return "".join(parts)


def cmd_plot(args):
    series = []
    if args.metrics:
        from tetris_mcts_tpu.obs.metrics import MetricsReader

        r = MetricsReader(args.metrics)
        r.poll()
        eps = r.of_kind("episode")
        if args.what == "lines":
            series = [[e["lines"] for e in eps]]
        elif args.what == "score":
            series = [[e["score"] for e in eps]]
        else:  # loss
            tr = [e for e in r.of_kind("train_session")
                  if e.get("loss_train") is not None]
            series = [[e["loss_train"] for e in tr],
                      [e["loss_val"] for e in tr]]
    elif args.loss:
        from tetris_mcts_tpu.utils.data import LossLoader

        ld = LossLoader(args.loss)
        series = [ld.loss_train.tolist(), ld.loss_val.tolist()]
    with open(args.out, "w") as f:
        f.write(_svg_line(series))
    print(f"wrote {args.out}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="tetris-tpu tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("sanity")
    s.add_argument("--checkpoint", default="./checkpoints/model_vv.msgpack")
    s.add_argument("--model", default="vv", choices=("vv", "vp", "dist"),
                   help="net type (test.py checks the vv net, "
                        "test_dist.py the C51 net)")

    s = sub.add_parser("inference_speed")
    s.add_argument("--iters", type=int, default=10000)
    s.add_argument("--batch", type=int, default=5)

    s = sub.add_parser("train_dump")
    s.add_argument("dump", help="npz with states/values/variance/weights")
    s.add_argument("--checkpoint", default="./checkpoints/model_vv.msgpack")
    s.add_argument("--load_model", action="store_true",
                   help="start from the checkpoint instead of fresh init")
    s.add_argument("--save_model", action="store_true",
                   help="overwrite the checkpoint with the retrained net "
                        "(off by default: this is a reproducibility probe)")
    s.add_argument("--batch_size", type=int, default=128)
    s.add_argument("--iters_per_val", type=int, default=100)
    s.add_argument("--max_iters", type=int, default=10000)

    s = sub.add_parser("print_dump_grad")
    s.add_argument("dump", nargs="?", default="./data/dump_grad.npz")

    s = sub.add_parser("plot")
    s.add_argument("--metrics", default="")
    s.add_argument("--loss", default="", help="loss*.h5 glob")
    s.add_argument("--what", default="lines", choices=("lines", "score", "loss"))
    s.add_argument("--out", default="plot.svg")

    args = p.parse_args(argv)
    return {
        "sanity": cmd_sanity,
        "inference_speed": cmd_inference_speed,
        "train_dump": cmd_train_dump,
        "print_dump_grad": cmd_print_dump_grad,
        "plot": cmd_plot,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main() or 0)
