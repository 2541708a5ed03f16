"""Prompt-template loader (parity port of reference training/prompts.py:8-25).

A frozen template with a ``{RAW_TEXT}`` placeholder; ``render`` formats the
raw text in.  Templates are tiny strings — load once on the driver and ship
in the task closure, never read files inside workers.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path


@dataclass(frozen=True)
class PromptTemplate:
    template: str

    @classmethod
    def from_file(cls, path: str | Path) -> "PromptTemplate":
        template_path = Path(path).expanduser().resolve()
        if not template_path.exists():
            raise FileNotFoundError(f"Prompt template not found: {template_path}")
        return cls(template=template_path.read_text(encoding="utf-8"))

    def render(self, raw_text: str) -> str:
        return str(self.template).format(RAW_TEXT=str(raw_text or ""))
