"""Overlay a bisect run's lines/episode against the reference endless log.

Reads the reference's raw self-play log
(/root/reference/results/online-200sims/log_endless: `Episode: N Score: S
Lines Cleared: L` lines) and a metrics JSONL stream from this framework,
prints a window-mean comparison table, and (with --svg) writes an overlay
plot. The reference curve is the target the round-5 bisect tries to
reproduce (VERDICT r4 task 1).

Usage:
  python scripts/overlay_bisect.py runs/bisect_r5/m.jsonl \
      [--ref /root/reference/results/online-200sims/log_endless] \
      [--window 50] [--svg runs/bisect_r5/overlay.svg]
"""
import argparse
import json
import re


def read_ref(path):
    """[(episode, lines)] from the reference stderr log."""
    pat = re.compile(
        r"Episode:\s*(\d+)\s+Score:\s*(\d+)\s+Lines Cleared:\s*(\d+)")
    out = []
    with open(path, errors="replace") as f:
        for line in f:
            m = pat.search(line)
            if m:
                out.append((int(m.group(1)), int(m.group(3))))
    return out


def read_ours(path):
    out = []
    n = 0
    for line in open(path):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("kind") == "episode" and not d.get("benchmark"):
            n += 1
            out.append((n, d["lines"]))
    return out


def window_means(eps, w):
    """[(window_end_episode, mean_lines)]"""
    res = []
    for i in range(w, len(eps) + 1, w):
        chunk = [l for _, l in eps[i - w:i]]
        res.append((eps[i - 1][0], sum(chunk) / len(chunk)))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics")
    ap.add_argument("--ref",
                    default="/root/reference/results/online-200sims/"
                            "log_endless")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--svg", default="")
    args = ap.parse_args()

    ref = read_ref(args.ref)
    ours = read_ours(args.metrics)
    rw = window_means(ref, args.window)
    ow = window_means(ours, args.window)

    print(f"{'ep':>6} {'ref mean-lines':>14} {'ours mean-lines':>15}")
    n = max(len(rw), len(ow))
    for i in range(n):
        r = f"{rw[i][1]:14.2f}" if i < len(rw) else " " * 14
        o = f"{ow[i][1]:15.2f}" if i < len(ow) else " " * 15
        ep = (ow[i][0] if i < len(ow) else rw[i][0])
        print(f"{ep:>6} {r} {o}")

    if ours:
        tail = [l for _, l in ours[-args.window:]]
        print(f"\nours: {len(ours)} episodes, last-{len(tail)} mean "
              f"{sum(tail)/len(tail):.2f} lines, best "
              f"{max(l for _, l in ours)}")
    if args.svg and ow:
        _write_svg(args.svg, rw, ow)
        print(f"overlay written to {args.svg}")


def _write_svg(path, rw, ow):
    import math
    W, H, P = 720, 420, 48
    xs = max(e for e, _ in (rw + ow)) or 1
    # log-scale y: the reference spans 0.1 .. 1000+ lines/ep
    def ylog(v):
        return math.log10(max(v, 0.05))
    ymin, ymax = ylog(0.05), ylog(max(v for _, v in (rw + ow)) * 1.3)

    def px(e):
        return P + (W - 2 * P) * e / xs

    def py(v):
        return H - P - (H - 2 * P) * (ylog(v) - ymin) / (ymax - ymin)

    def poly(pts, color):
        s = " ".join(f"{px(e):.1f},{py(v):.1f}" for e, v in pts)
        return (f'<polyline fill="none" stroke="{color}" stroke-width="2" '
                f'points="{s}"/>')

    grid = []
    for dec in (0.1, 1, 10, 100, 1000):
        if ylog(dec) <= ymax:
            y = py(dec)
            grid.append(f'<line x1="{P}" y1="{y:.1f}" x2="{W-P}" '
                        f'y2="{y:.1f}" stroke="#ddd"/>'
                        f'<text x="6" y="{y+4:.1f}" font-size="11" '
                        f'fill="#666">{dec:g}</text>')
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}">'
        f'<rect width="{W}" height="{H}" fill="white"/>'
        + "".join(grid)
        + poly(rw, "#888") + poly(ow, "#0b62d6")
        + f'<text x="{P}" y="20" font-size="13">lines/episode '
          f'(window means, log scale) — gray: reference log_endless, '
          f'blue: this run</text>'
        + f'<text x="{W//2}" y="{H-10}" font-size="11" fill="#666">'
          f'episode</text>'
        '</svg>'
    )
    with open(path, "w") as f:
        f.write(svg)


if __name__ == "__main__":
    main()
