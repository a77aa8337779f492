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

Interactive camera (the reference's key controls, src/main.cpp:115-137
/ README.md:57-61): pass ``--ctrl FILE`` to both sides —

    python -m pathtrace_tpu.cli scenes/cornell.txt \
        --preview-every 20 --interactive /tmp/cam.ctrl
    python -m pathtrace_tpu.tools.watch /tmp/cornell.preview.png \
        --ctrl /tmp/cam.ctrl

arrows orbit, w/a/s/d/r/f translate, space saves, esc/q quits.  Each
keypress appends an event line to FILE; the renderer polls it between
chunks and RESTARTS accumulation on any camera key (the reference's
camchanged -> iteration=0 contract).
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


# terminal byte sequence -> control-file key event (arrow keys are
# CSI sequences; the rest are plain characters)
_KEY_SEQS = {
    b"\x1b[A": "up", b"\x1b[B": "down",
    b"\x1b[C": "right", b"\x1b[D": "left",
    b"w": "w", b"a": "a", b"s": "s", b"d": "d",
    b"r": "r", b"f": "f", b" ": "space",
    b"\x1b": "esc", b"q": "q",
}


def _drain_keys(fd) -> list:
    """Non-blocking read of pending keypresses from ``fd`` (raw mode),
    decoded to control-file event names."""
    import select

    events = []
    buf = b""
    while select.select([fd], [], [], 0)[0]:
        try:
            chunk = os.read(fd, 64)
        except OSError:       # terminal hangup (EIO over dead ssh)
            return ["q"]
        if not chunk:         # EOF: stdin closed -> quit cleanly
            return events + ["q"]
        buf += chunk
    while buf:
        # longest-match CSI first, then single chars
        for seq in (buf[:3], buf[:1]):
            if seq in _KEY_SEQS:
                # lone ESC only if not the start of a CSI sequence
                if seq == b"\x1b" and buf[:2] == b"\x1b[":
                    continue
                events.append(_KEY_SEQS[seq])
                buf = buf[len(seq):]
                break
        else:
            buf = buf[1:]
    return events


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="live render preview (ANSI)")
    p.add_argument("png", help="PNG file to watch (re-read on change)")
    p.add_argument("--interval", type=float, default=1.0)
    p.add_argument("--once", action="store_true",
                   help="render once and exit")
    p.add_argument("--ctrl", default=None, metavar="FILE",
                   help="capture keys and append camera events to FILE "
                        "(pair with cli --interactive FILE)")
    args = p.parse_args(argv)

    from PIL import Image

    raw_ctx = None
    if args.ctrl:
        if not sys.stdin.isatty():
            print("--ctrl needs a tty", file=sys.stderr)
            return 1
        import termios
        import tty

        from ..render.interact import send_key

        fd = sys.stdin.fileno()
        raw_ctx = (fd, termios.tcgetattr(fd))
        tty.setcbreak(fd)

    last_mtime = 0.0
    try:
        while True:
            if raw_ctx is not None:
                for ev in _drain_keys(raw_ctx[0]):
                    send_key(args.ctrl, ev)
                    if ev in ("esc", "q"):
                        return 0
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
            time.sleep(args.interval if raw_ctx is None else 0.05)
    except KeyboardInterrupt:
        return 0
    finally:
        if raw_ctx is not None:
            import termios

            termios.tcsetattr(raw_ctx[0], termios.TCSADRAIN, raw_ctx[1])


if __name__ == "__main__":
    sys.exit(main())
