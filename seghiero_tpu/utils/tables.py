"""Minimal ASCII table renderer.

Capability parity with the reference's terminaltables epoch report
(train.py:403-414) without the dependency (not in this image).
"""

from __future__ import annotations

from typing import List, Sequence


def ascii_table(rows: Sequence[Sequence[object]]) -> str:
    cells: List[List[str]] = [[str(c) for c in row] for row in rows]
    widths = [max(len(r[i]) for r in cells) for i in range(len(cells[0]))]

    def hline():
        return "+" + "+".join("-" * (w + 2) for w in widths) + "+"

    def fmt(row):
        return "| " + " | ".join(c.ljust(w) for c, w in zip(row, widths)) + " |"

    lines = [hline(), fmt(cells[0]), hline()]
    for row in cells[1:]:
        lines.append(fmt(row))
    lines.append(hline())
    return "\n".join(lines)
