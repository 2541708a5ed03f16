"""Pure per-document kernels — the byte-identity oracle surface.

Every function here is deterministic, picklable, and free of Ray / I/O
dependencies so it can (a) run inside ``map_batches`` closures on any worker
and (b) serve as the plain-Python oracle that the Dataset pipeline is tested
against byte-for-byte.
"""

from .detect import compile_rules, regex_detect, resolve_conflicts
from .replace import fallback_generate, replace_text
from .contracts import normalize_entity, replacement_key, context_hash
from .html_text import html_to_text
from .docpipe import process_document

__all__ = [
    "compile_rules",
    "regex_detect",
    "resolve_conflicts",
    "fallback_generate",
    "replace_text",
    "normalize_entity",
    "replacement_key",
    "context_hash",
    "html_to_text",
    "process_document",
]
