"""Dependency-free raster drawing for the pipeline PNG renderer.

The reference's ``PipelineRendererPng``
(``src/kiara/renderers/included_renderers/pipeline.py:122-196``) shells
out to graphviz to draw the pipeline's execution graph.  This container
carries no raster backend (no graphviz/matplotlib/PIL), so the repo
draws the DAG itself: a tiny RGB canvas (rect/line/5x7-bitmap text) and
a stage-column layout — stages left to right (the same layering
``PipelineStructure.stages`` computes for execution), steps as labeled
boxes, input links as lines.  The PNG bytes come from
:func:`~.operators.media_codecs.encode_png` (stdlib zlib).
"""

from __future__ import annotations

# classic 5x7 column font (5 bytes per glyph, bit 0 = top row); ASCII
# subset sufficient for step ids / module types; lowercase maps to upper
_FONT = {
    "A": (0x7E, 0x11, 0x11, 0x11, 0x7E), "B": (0x7F, 0x49, 0x49, 0x49, 0x36),
    "C": (0x3E, 0x41, 0x41, 0x41, 0x22), "D": (0x7F, 0x41, 0x41, 0x22, 0x1C),
    "E": (0x7F, 0x49, 0x49, 0x49, 0x41), "F": (0x7F, 0x09, 0x09, 0x09, 0x01),
    "G": (0x3E, 0x41, 0x49, 0x49, 0x7A), "H": (0x7F, 0x08, 0x08, 0x08, 0x7F),
    "I": (0x00, 0x41, 0x7F, 0x41, 0x00), "J": (0x20, 0x40, 0x41, 0x3F, 0x01),
    "K": (0x7F, 0x08, 0x14, 0x22, 0x41), "L": (0x7F, 0x40, 0x40, 0x40, 0x40),
    "M": (0x7F, 0x02, 0x0C, 0x02, 0x7F), "N": (0x7F, 0x04, 0x08, 0x10, 0x7F),
    "O": (0x3E, 0x41, 0x41, 0x41, 0x3E), "P": (0x7F, 0x09, 0x09, 0x09, 0x06),
    "Q": (0x3E, 0x41, 0x51, 0x21, 0x5E), "R": (0x7F, 0x09, 0x19, 0x29, 0x46),
    "S": (0x46, 0x49, 0x49, 0x49, 0x31), "T": (0x01, 0x01, 0x7F, 0x01, 0x01),
    "U": (0x3F, 0x40, 0x40, 0x40, 0x3F), "V": (0x1F, 0x20, 0x40, 0x20, 0x1F),
    "W": (0x3F, 0x40, 0x38, 0x40, 0x3F), "X": (0x63, 0x14, 0x08, 0x14, 0x63),
    "Y": (0x07, 0x08, 0x70, 0x08, 0x07), "Z": (0x61, 0x51, 0x49, 0x45, 0x43),
    "0": (0x3E, 0x51, 0x49, 0x45, 0x3E), "1": (0x00, 0x42, 0x7F, 0x40, 0x00),
    "2": (0x42, 0x61, 0x51, 0x49, 0x46), "3": (0x21, 0x41, 0x45, 0x4B, 0x31),
    "4": (0x18, 0x14, 0x12, 0x7F, 0x10), "5": (0x27, 0x45, 0x45, 0x45, 0x39),
    "6": (0x3C, 0x4A, 0x49, 0x49, 0x30), "7": (0x01, 0x71, 0x09, 0x05, 0x03),
    "8": (0x36, 0x49, 0x49, 0x49, 0x36), "9": (0x06, 0x49, 0x49, 0x29, 0x1E),
    ".": (0x00, 0x60, 0x60, 0x00, 0x00), "-": (0x08, 0x08, 0x08, 0x08, 0x08),
    "_": (0x40, 0x40, 0x40, 0x40, 0x40), ":": (0x00, 0x36, 0x36, 0x00, 0x00),
    "/": (0x20, 0x10, 0x08, 0x04, 0x02), " ": (0x00, 0x00, 0x00, 0x00, 0x00),
}


class Canvas:
    """Top-down row-major RGB pixel buffer with the three primitives the
    DAG needs: filled/outlined rect, straight line (Bresenham), 5x7 text."""

    def __init__(self, width: int, height: int,
                 bg: tuple[int, int, int] = (255, 255, 255)):
        self.width, self.height = width, height
        self._px = bytearray(bytes(bg) * (width * height))

    def put(self, x: int, y: int, rgb: tuple[int, int, int]) -> None:
        if 0 <= x < self.width and 0 <= y < self.height:
            i = (y * self.width + x) * 3
            self._px[i:i + 3] = bytes(rgb)

    def rect(self, x0: int, y0: int, x1: int, y1: int,
             outline=(0, 0, 0), fill=None) -> None:
        if fill is not None:
            for y in range(y0, y1 + 1):
                for x in range(x0, x1 + 1):
                    self.put(x, y, fill)
        for x in range(x0, x1 + 1):
            self.put(x, y0, outline)
            self.put(x, y1, outline)
        for y in range(y0, y1 + 1):
            self.put(x0, y, outline)
            self.put(x1, y, outline)

    def line(self, x0: int, y0: int, x1: int, y1: int,
             rgb=(0, 0, 0)) -> None:
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
        err = dx + dy
        while True:
            self.put(x0, y0, rgb)
            if x0 == x1 and y0 == y1:
                break
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x0 += sx
            if e2 <= dx:
                err += dx
                y0 += sy

    def text(self, x: int, y: int, s: str, rgb=(0, 0, 0)) -> None:
        cx = x
        for ch in s:
            glyph = _FONT.get(ch.upper(), _FONT[" "])
            for col, bits in enumerate(glyph):
                for row in range(7):
                    if bits >> row & 1:
                        self.put(cx + col, y + row, rgb)
            cx += 6

    def to_png(self) -> bytes:
        from .operators.media_codecs import encode_png

        return encode_png(bytes(self._px), self.width, self.height)


def text_width(s: str) -> int:
    return 6 * len(s)


_BOX_FILL = (232, 240, 254)
_BOX_EDGE = (47, 84, 150)
_EDGE = (120, 120, 120)


def pipeline_dag_png(name: str, stages: list[list[str]],
                     steps: dict[str, dict]) -> bytes:
    """Draw the execution DAG: one column per stage, a labeled box per
    step (step id over module type), a line per input link from the
    producer box's right edge to the consumer box's left edge.

    ``steps``: step_id -> {"module_type": str, "links": [producer ids]}.
    Returns PNG bytes."""
    pad, box_h, vgap, hgap, title_h = 24, 34, 26, 70, 28
    col_w = []
    for col in stages:
        w = max((max(text_width(sid), text_width(steps[sid]["module_type"]))
                 for sid in col), default=40) + 16
        col_w.append(max(w, 60))
    width = pad * 2 + sum(col_w) + hgap * max(len(stages) - 1, 0)
    rows = max((len(c) for c in stages), default=1)
    height = title_h + pad * 2 + rows * box_h + (rows - 1) * vgap
    cv = Canvas(max(width, text_width(name) + 2 * pad), height)
    cv.text(pad, 10, f"PIPELINE {name}")

    pos: dict[str, tuple[int, int, int, int]] = {}
    x = pad
    for ci, col in enumerate(stages):
        for ri, sid in enumerate(col):
            y = title_h + pad + ri * (box_h + vgap)
            pos[sid] = (x, y, x + col_w[ci], y + box_h)
        x += col_w[ci] + hgap
    # edges under boxes: producer right-center -> consumer left-center
    for sid, meta in steps.items():
        x0b, y0b, x1b, y1b = pos[sid]
        for src in meta.get("links", []):
            sx0, sy0, sx1, sy1 = pos[src]
            cv.line(sx1, (sy0 + sy1) // 2, x0b, (y0b + y1b) // 2, _EDGE)
    for sid, meta in steps.items():
        x0b, y0b, x1b, y1b = pos[sid]
        cv.rect(x0b, y0b, x1b, y1b, outline=_BOX_EDGE, fill=_BOX_FILL)
        cv.text(x0b + 8, y0b + 7, sid, _BOX_EDGE)
        cv.text(x0b + 8, y0b + 19, meta["module_type"], (90, 90, 90))
    return cv.to_png()
