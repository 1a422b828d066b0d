"""Dictionary mention detection + NUMBER/MONEY/TIME tagging.

Mirrors the reference semantics:
- ENAMEX name tagging via dictionary longest-match (the onoma analog,
  props:21-27; JetEngineBuilder.java:140-156);
- integer tokens → NUMBER, ``$``-prefixed → MONEY, time words → TIME,
  thousand/million/billion multiplier merge, crossing-span suppression
  (IcePreprocessor.java:572-658, 692-698).

A Mention is ``(start, end, head_start, head_end, type, mtype)`` with char
offsets; for names head == extent (jetHead of a NAM mention).
"""

from __future__ import annotations

import re

from .lexicon import NUMBER_MULTIPLIERS, TIME_WORDS

_INT_RE = re.compile(r"^\d+(?:,\d{3})*$")
_MONEY_RE = re.compile(r"^\$\d+(?:[.,]\d+)*$")

Mention = tuple[int, int, int, int, str, str]


def _crosses(start: int, end: int, taken: list[tuple[int, int]]) -> bool:
    for s, e in taken:
        if start < e and s < end:
            return True
    return False


def find_mentions(
    tokens: list[tuple[int, int, str]],
    entity_dict: dict[tuple[str, ...], str],
    max_phrase_len: int,
    fold_case: bool = False,
) -> list[Mention]:
    """Longest-match dictionary names first, then NUMBER/MONEY/TIME with
    crossing suppression.  Returns mentions sorted by start offset.
    ``fold_case=True`` is monocase mode (Ace.monocase analog,
    IcePreprocessor.java:213): lookups fold to lowercase — the dict must
    then be lowercase-keyed."""
    n = len(tokens)
    mentions: list[Mention] = []
    taken: list[tuple[int, int]] = []
    i = 0
    get = entity_dict.get

    def word(j: int) -> str:
        return tokens[j][2].lower() if fold_case else tokens[j][2]

    while i < n:
        matched = 0
        mtype = None
        limit = min(max_phrase_len, n - i)
        for ln in range(limit, 1, -1):
            etype = get(tuple(word(j) for j in range(i, i + ln)))
            if etype is not None:
                matched, mtype = ln, etype
                break
        if not matched:
            etype = get((word(i),))
            if etype is not None:
                matched, mtype = 1, etype
        if matched:
            s = tokens[i][0]
            e = tokens[i + matched - 1][1]
            mentions.append((s, e, s, e, mtype, "NAM"))
            taken.append((s, e))
            i += matched
        else:
            i += 1

    # NUMBER / MONEY / TIME (suppressed when crossing a name span)
    j = 0
    while j < n:
        s, e, w = tokens[j]
        span_end = e
        etype = None
        if _MONEY_RE.match(w):
            etype = "MONEY"
        elif _INT_RE.match(w):
            etype = "NUMBER"
            # multiplier merge: "5 million" → one NUMBER mention
            if j + 1 < n and tokens[j + 1][2].lower() in NUMBER_MULTIPLIERS:
                span_end = tokens[j + 1][1]
                j += 1
        elif w.lower() in TIME_WORDS:
            etype = "TIME"
        if etype is not None and not _crosses(s, span_end, taken):
            mentions.append((s, span_end, s, span_end, etype, "NAM"))
            taken.append((s, span_end))
        j += 1

    mentions.sort()
    return mentions
