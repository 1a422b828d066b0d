"""Regex tokenizer + sentence splitter over raw turn text.

Standoff spans (start, end) over the original char buffer, like JET
annotations (docs/ICE_Design.md:42-62).  Compiled once per actor.
"""

from __future__ import annotations

import re

# words (incl. internal apostrophes/hyphens), numbers (incl. $ and
# comma/decimal groups), or single punctuation
_TOKEN_RE = re.compile(
    r"\$?\d+(?:[.,]\d+)*|[A-Za-z]+(?:['\-][A-Za-z]+)*|'s|\S"
)

_SENT_END_RE = re.compile(r"[.!?]+(?=\s|$)")


def tokenize(text: str, start: int = 0, end: int | None = None) -> list[tuple[int, int, str]]:
    """→ list of (start, end, surface) spans within text[start:end]."""
    if end is None:
        end = len(text)
    out = []
    for m in _TOKEN_RE.finditer(text, start, end):
        out.append((m.start(), m.end(), m.group()))
    return out


def split_sentences(text: str) -> list[tuple[int, int]]:
    """→ list of (start, end) sentence spans (SentenceSplitter analog,
    DepPaths.java:238)."""
    spans = []
    start = 0
    for m in _SENT_END_RE.finditer(text):
        e = m.end()
        if text[start:e].strip():
            spans.append((start, e))
        start = e
    if text[start:].strip():
        spans.append((start, len(text)))
    # trim leading whitespace of each span
    out = []
    for s, e in spans:
        while s < e and text[s].isspace():
            s += 1
        if s < e:
            out.append((s, e))
    return out
