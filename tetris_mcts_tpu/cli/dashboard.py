"""`dashboard` entrypoint — live dashboard over a metrics JSONL stream
(the reference's `python web/web_dash.py <logfile>`, SURVEY.md §3.5)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="tetris-tpu dashboard")
    p.add_argument("--metrics", required=True, help="JSONL metrics path")
    p.add_argument("--status_dir", default="",
                   help="live-state memmap dir ('' = no board panel)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--port", type=int, default=8050)
    p.add_argument("--checkpoint", default="",
                   help="checkpoint to watch for the weight-histogram panel "
                        "(reference web/parseLog.py:176-186 polls mtime)")
    args = p.parse_args(argv)

    from tetris_mcts_tpu.obs.dashboard import serve

    serve(args.metrics, args.status_dir, args.batch, args.port,
          checkpoint=args.checkpoint)


if __name__ == "__main__":
    main()
