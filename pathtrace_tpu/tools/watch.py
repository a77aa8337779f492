"""Live terminal preview — the headless replacement for the reference's
GLFW/CUDA-GL preview window (src/preview.cpp).

Renders a PNG (e.g. the CLI's ``--preview-every`` dump) into the
terminal with ANSI truecolor half-blocks, polling for changes, with the
iteration count in the "title" line like the reference's window title
(src/preview.cpp:174-175).

Usage:
    python -m pathtrace_tpu.tools.watch /tmp/cornell.preview.png
    # in another shell:
    python -m pathtrace_tpu.cli scenes/cornell.txt --preview-every 100
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np


def render_ansi(img: np.ndarray, max_cols: int, max_rows: int) -> str:
    """(H,W,3) uint8 -> ANSI half-block string (2 pixels per cell row)."""
    h, w, _ = img.shape
    scale = max(w / max_cols, h / (max_rows * 2), 1e-9)
    ow = max(int(w / scale), 1)
    oh = max(int(h / scale) // 2 * 2, 2)
    ys = (np.arange(oh) * (h / oh)).astype(int).clip(0, h - 1)
    xs = (np.arange(ow) * (w / ow)).astype(int).clip(0, w - 1)
    small = img[ys][:, xs]
    top = small[0::2]
    bot = small[1::2]
    lines = []
    for r in range(top.shape[0]):
        row = []
        for c in range(ow):
            tr, tg, tb = top[r, c]
            br, bg, bb = bot[r, c] if r < bot.shape[0] else (0, 0, 0)
            row.append(
                f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg};{bb}m▀"
            )
        lines.append("".join(row) + "\x1b[0m")
    return "\n".join(lines)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="live render preview (ANSI)")
    p.add_argument("png", help="PNG file to watch (re-read on change)")
    p.add_argument("--interval", type=float, default=1.0)
    p.add_argument("--once", action="store_true",
                   help="render once and exit")
    args = p.parse_args(argv)

    from PIL import Image

    last_mtime = 0.0
    try:
        while True:
            try:
                mtime = os.path.getmtime(args.png)
            except OSError:
                if args.once:
                    print(f"no such file: {args.png}", file=sys.stderr)
                    return 1
                time.sleep(args.interval)
                continue
            if mtime != last_mtime:
                last_mtime = mtime
                img = np.asarray(Image.open(args.png).convert("RGB"))
                cols, rows = shutil.get_terminal_size()
                out = render_ansi(img, cols, rows - 2)
                sys.stdout.write("\x1b[2J\x1b[H")  # clear + home
                age = time.strftime("%H:%M:%S", time.localtime(mtime))
                print(f"{args.png}  [{img.shape[1]}x{img.shape[0]}, {age}]")
                print(out)
                sys.stdout.flush()
            if args.once:
                return 0
            time.sleep(args.interval)
    except KeyboardInterrupt:
        return 0


if __name__ == "__main__":
    sys.exit(main())
