"""Overlay learning progress on TRAINING-SESSION and CUMULATIVE-ROWS axes.

The per-episode overlay (scripts/overlay_bisect.py) is the reference's own
yardstick, but a batched campaign paces its growth-gated sessions per unit
DATA, not per episode: at batch 256 each episode carries ~5-12x fewer
training sessions than the reference's single-game endless run
(/root/reference/results/online-200sims/log_endless, 131 sessions over 524
episodes). This tool aligns the two runs on the axes training actually
advances on:

  - session axis:   mean lines/episode in the episodes FOLLOWING session n
  - rows axis:      same, vs cumulative training-set rows consumed

Reference markers: 'Training data size: N' lines interleaved with
'Episode: ...' lines in the stderr log. Ours: train_session + episode
events in the metrics JSONL.

Usage:
  python scripts/overlay_sessions.py runs/campaign3/m.jsonl \
      [--ref /root/reference/results/online-200sims/log_endless] [--svg f]
"""
import argparse
import json
import re


def read_ref(path):
    """([(ep, lines)], [(session_n, ep_at_session, rows)])."""
    ep_pat = re.compile(
        r"Episode:\s*(\d+)\s+Score:\s*(\d+)\s+Lines Cleared:\s*(\d+)")
    tr_pat = re.compile(r"Training data size:\s*(\d+)")
    eps, sessions = [], []
    last_ep = 0
    with open(path, errors="replace") as f:
        for line in f:
            m = ep_pat.search(line)
            if m:
                last_ep = int(m.group(1))
                eps.append((last_ep, int(m.group(3))))
                continue
            m = tr_pat.search(line)
            if m:
                sessions.append((len(sessions) + 1, last_ep, int(m.group(1))))
    return eps, sessions


def read_ours(path):
    eps, sessions = [], []
    n = 0
    for line in open(path):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("kind") == "episode" and not d.get("benchmark"):
            n += 1
            eps.append((n, d["lines"]))
        elif d.get("kind") == "train_session":
            sessions.append((len(sessions) + 1, n, int(d.get("rows", 0))))
    return eps, sessions


def lines_after(eps, ep_mark, window):
    """Mean lines over up to `window` episodes following episode ep_mark."""
    chunk = [l for e, l in eps if ep_mark < e <= ep_mark + window]
    return sum(chunk) / len(chunk) if chunk else None


def rows_cum(sessions):
    out, c = [], 0
    for n, ep, rows in sessions:
        c += rows
        out.append((n, ep, c))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics")
    ap.add_argument("--ref", default="/root/reference/results/"
                                     "online-200sims/log_endless")
    ap.add_argument("--window", type=int, default=0,
                    help="episodes after each session to average "
                         "(default: auto — 25 ref / 200 ours)")
    ap.add_argument("--every", type=int, default=5,
                    help="print every Nth session row")
    ap.add_argument("--svg", default="")
    args = ap.parse_args()

    ref_eps, ref_sessions = read_ref(args.ref)
    our_eps, our_sessions = read_ours(args.metrics)
    ref_cum = rows_cum(ref_sessions)
    our_cum = rows_cum(our_sessions)

    wr = args.window or 25
    wo = args.window or 200
    print(f"{'session':>7} | {'ref cum-rows':>12} {'ref lines-after':>15} | "
          f"{'ours cum-rows':>13} {'ours lines-after':>16}")
    n = max(len(ref_cum), len(our_cum))
    ref_pts, our_pts = [], []
    for i in range(n):
        rtxt = " " * 29
        otxt = ""
        if i < len(ref_cum):
            _, ep, c = ref_cum[i]
            v = lines_after(ref_eps, ep, wr)
            if v is not None:
                ref_pts.append((i + 1, c, v))
                rtxt = f"{c:>12} {v:>15.2f}"
        if i < len(our_cum):
            _, ep, c = our_cum[i]
            v = lines_after(our_eps, ep, wo)
            if v is not None:
                our_pts.append((i + 1, c, v))
                otxt = f"{c:>13} {v:>16.2f}"
        if (i + 1) % args.every == 0 or i == n - 1:
            print(f"{i + 1:>7} | {rtxt} | {otxt}")

    if args.svg and our_pts:
        _write_svg(args.svg, ref_pts, our_pts)
        print(f"overlay written to {args.svg}")


def _write_svg(path, ref_pts, our_pts):
    import math
    W, H, P = 720, 420, 48
    xs = max(s for s, _, _ in (ref_pts + our_pts)) or 1

    def ylog(v):
        return math.log10(max(v, 0.05))
    ymax = ylog(max(v for _, _, v in (ref_pts + our_pts)) * 1.3)
    ymin = ylog(0.05)

    def px(s):
        return P + (W - 2 * P) * s / xs

    def py(v):
        return H - P - (H - 2 * P) * (ylog(v) - ymin) / (ymax - ymin)

    def poly(pts, color):
        s = " ".join(f"{px(s):.1f},{py(v):.1f}" for s, _, v in pts)
        return (f'<polyline fill="none" stroke="{color}" stroke-width="2" '
                f'points="{s}"/>')

    grid = []
    for dec in (0.1, 1, 10, 100, 1000):
        if ylog(dec) <= ymax:
            y = py(dec)
            grid.append(f'<line x1="{P}" y1="{y:.1f}" x2="{W - P}" '
                        f'y2="{y:.1f}" stroke="#ddd"/>'
                        f'<text x="6" y="{y + 4:.1f}" font-size="11" '
                        f'fill="#666">{dec:g}</text>')
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}">'
        f'<rect width="{W}" height="{H}" fill="white"/>'
        + "".join(grid)
        + poly(ref_pts, "#888") + poly(our_pts, "#0b62d6")
        + f'<text x="{P}" y="20" font-size="13">lines/episode after each '
          f'training session (log scale) — gray: reference log_endless, '
          f'blue: this run</text>'
        + f'<text x="{W // 2}" y="{H - 10}" font-size="11" fill="#666">'
          f'training session</text>'
        '</svg>'
    )
    with open(path, "w") as f:
        f.write(svg)


if __name__ == "__main__":
    main()
