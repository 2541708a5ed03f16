"""Format rebuild sinks (S9).

The parquet-native pipeline's primary "rebuild" is the ``clean_text`` column
itself plus the partitioned parquet sink.  For structured formats the
reference rewrites the original artifact cell-by-cell; the pure kernels here
reproduce that for the text and CSV handlers:

- :func:`rebuild_text` — the ``.deid.txt`` artifact body (text.py:43-52:
  just the output text);
- :func:`rebuild_csv` — cell-targeted replacement (csv.py:41-93): for each
  entity carrying a cell anchor, replace the first occurrence of the
  original value in that cell with ``replacement_map[f"{type}:{original}"]``.

DOCX/XLSX/PPTX/PDF/image rebuilds require their binary libraries (absent
here) and follow the same shape: entities-with-anchors + replacement_map →
targeted in-place edits.
"""

from __future__ import annotations

import csv
import io
from typing import Any

from .contracts import replacement_key


def rebuild_text(output_text: str) -> str:
    return output_text


def rebuild_csv(
    payload: str,
    entities: list[dict[str, Any]],
    replacement_map: dict[str, str],
) -> str:
    """Rewrite a CSV payload with per-cell targeted replacements.

    ``entities`` use the engine's Arrow shape (``cell_address`` like "R2C1"
    or a ``cell`` dict with row/col); rows/cols are 1-based.
    """
    rows = list(csv.reader(io.StringIO(payload, newline="")))

    for entity in entities:
        cell = entity.get("cell")
        if cell:
            row, col = int(cell.get("row", 0)), int(cell.get("col", 0))
        else:
            address = entity.get("cell_address")
            if not address or not address.startswith("R") or "C" not in address:
                continue
            row_s, col_s = address[1:].split("C", 1)
            try:
                row, col = int(row_s), int(col_s)
            except ValueError:
                continue
        if row <= 0 or col <= 0 or row > len(rows) or col > len(rows[row - 1]):
            continue

        original = entity.get("text")
        entity_type = entity.get("type")
        if not original or not entity_type:
            continue
        replacement = replacement_map.get(replacement_key(str(entity_type), str(original)))
        if replacement is None:
            continue
        current = str(rows[row - 1][col - 1] or "")
        rows[row - 1][col - 1] = current.replace(str(original), str(replacement), 1)

    out = io.StringIO()
    csv.writer(out).writerows(rows)
    return out.getvalue()
