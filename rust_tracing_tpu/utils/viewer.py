"""Terminal live viewer: the progressive preview surface.

The reference opens an FLTK window and blits a GPU surface per frame
(src/renderer.rs:77-137). A TPU render box is headless; the equivalent
interactive surface is the terminal itself: the accumulation buffer is
downsampled and drawn in-place with 24-bit ANSI color, two pixels per
character cell via the upper-half-block glyph. Works over SSH, refreshes
in place, and shows the running spp like the reference's window title
(renderer.rs:101).
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np

from . import color as color_util

_UPPER_HALF = "▀"


def _downsample(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest/box downsample (H,W,3) -> (out_h,out_w,3) without PIL."""
    h, w, _ = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def frame_ansi(image_linear: np.ndarray, cols: int | None = None,
               rows: int | None = None) -> str:
    """Render a linear image to an ANSI string (2 image rows per text row)."""
    term = shutil.get_terminal_size((100, 40))
    cols = cols or max(20, term.columns - 2)
    rows = rows or max(10, term.lines - 3)
    h, w, _ = image_linear.shape
    # preserve aspect: a cell is ~1:2 (w:h), half-blocks give 2 subrows/cell
    out_w = min(cols, w)
    out_h = min(rows * 2, int(out_w * h / w)) & ~1
    out_w = min(out_w, max(2, int(out_h * w / h)))
    rgb = color_util.color_to_rgb8(
        _downsample(np.asarray(image_linear, np.float64), out_w, max(out_h, 2)))
    top = rgb[0::2]
    bot = rgb[1::2]
    lines = []
    for tr, br in zip(top, bot):
        cells = [f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m\x1b[48;2;{b[0]};{b[1]};{b[2]}m{_UPPER_HALF}"
                 for t, b in zip(tr, br)]
        lines.append("".join(cells) + "\x1b[0m")
    return "\n".join(lines)


class TerminalViewer:
    """Progressive in-place terminal display (no-op when not a tty)."""

    def __init__(self, force: bool | None = None):
        self.enabled = (sys.stdout.isatty() if force is None else force)
        self._last_lines = 0

    def show(self, image_linear: np.ndarray, status: str = "") -> None:
        if not self.enabled:
            return
        frame = frame_ansi(image_linear)
        n = frame.count("\n") + 2
        # move cursor up over the previous frame and redraw in place
        if self._last_lines:
            sys.stdout.write(f"\x1b[{self._last_lines}F")
        sys.stdout.write(frame + "\n" + status + "\x1b[K\n")
        sys.stdout.flush()
        self._last_lines = n
