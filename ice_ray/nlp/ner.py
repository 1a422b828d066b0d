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

# --- TIMEX2-style time expressions → ENAMEX TIME ------------------------
# The reference converts Jet's TIMEX2 spans to ENAMEX TIME mentions with a
# normalized val (IcePreprocessor.java:586-599); Jet's timex tagger is a
# model blob, so this is a deterministic characterization: month-name
# dates, 4-digit years, weekday names, and last/next/this + unit spans.

_MONTHS = {m: i + 1 for i, m in enumerate(
    ["january", "february", "march", "april", "may", "june", "july",
     "august", "september", "october", "november", "december"])}
_WEEKDAYS = {"monday", "tuesday", "wednesday", "thursday", "friday",
             "saturday", "sunday"}
_REL_MODS = {"last", "next", "this"}
_REL_UNITS = {"week", "month", "year"}
_YEAR_RE = re.compile(r"^(19|20)\d\d$")


def normalize_timex(tokens: list[str]) -> str:
    """TIMEX2 ``val``-style normalization of a recognized time span:
    month-day[-year] → ISO-ish date, year → YYYY, weekday/deictic words
    → uppercased symbols (the reference carries Jet's VAL through as an
    opaque feature, :593)."""
    toks = [t.lower() for t in tokens]
    if toks[0] in _MONTHS:
        m = _MONTHS[toks[0]]
        if len(toks) >= 2 and toks[1].isdigit():
            day_or_year = int(toks[1])
            if len(toks) == 3 and _YEAR_RE.match(toks[2]):
                return f"{int(toks[2]):04d}-{m:02d}-{day_or_year:02d}"
            if day_or_year > 31:
                return f"{day_or_year:04d}-{m:02d}"
            return f"XXXX-{m:02d}-{day_or_year:02d}"
        return f"XXXX-{m:02d}"
    if _YEAR_RE.match(toks[0]):
        return toks[0]
    if toks[0] in _WEEKDAYS:
        return toks[0].upper()
    if toks[0] in _REL_MODS and len(toks) == 2:
        return f"{toks[0].upper()}_{toks[1].upper()}"
    return "_".join(toks).upper()


def _timex_span(tokens: list[tuple[int, int, str]], j: int) -> int:
    """Number of tokens of the time expression starting at ``j`` (0 if
    none)."""
    w = tokens[j][2].lower()
    n = len(tokens)
    if w in _MONTHS:
        # "January 5 2024" | "January 5" | "January 2024" | "January"
        if j + 1 < n and tokens[j + 1][2].isdigit():
            if (j + 2 < n and _YEAR_RE.match(tokens[j + 2][2])
                    and not _YEAR_RE.match(tokens[j + 1][2])):
                return 3
            return 2
        return 1
    if _YEAR_RE.match(w) or w in _WEEKDAYS:
        return 1
    if w in _REL_MODS and j + 1 < n and tokens[j + 1][2].lower() in _REL_UNITS:
        return 2
    return 0


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

    # TIMEX → TIME, then NUMBER / MONEY / TIME words (each suppressed
    # when crossing an earlier span — the reference's isCrossedWithList
    # order: names, TIMEX, numbers; IcePreprocessor.java:580-658)
    j = 0
    while j < n:
        s, e, w = tokens[j]
        span_end = e
        etype = None
        tx = _timex_span(tokens, j)
        if tx:
            etype = "TIME"
            span_end = tokens[j + tx - 1][1]
            j += tx - 1
        elif _MONEY_RE.match(w):
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
