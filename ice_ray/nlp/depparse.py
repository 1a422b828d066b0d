"""Deterministic rule dependency parser (JET DepParser stand-in; the jar
is a missing blob, so this parser *defines* the reference parse on our
closed-vocabulary corpus — SURVEY.md §7 "known-hard items" #2).

Produces the same raw-parse conventions the reference unit tests feed in
literally (DepPathsTest.java:44-47, 73-80, 107-112):

- multiword names are single tokens (``Fred_Smith``) at the extent start;
- the subject attaches to the FIRST verb of a verb group, auxiliary chains
  are linked with ``vch`` edges, and objects/PPs attach to the LAST (main)
  verb — the later ``transform`` collapses the chain;
- a preposition attaches to an immediately preceding *common* noun (so
  quantity constructs like "pound of X" hang off the noun and the
  regularizer can delete them), otherwise to the main verb;
- appos for "NP , NP", conj for "NP and NP", poss for "X 's Y",
  punct from the first verb to the final period.
"""

from __future__ import annotations

from ..core.deppath import Rel, RelationSet

Token = tuple[int, int, str, str]  # start, end, word, pos

_NOUN_POS = ("NN", "NNS", "NNP", "NNPS", "CD")


def collapse_mentions(
    tokens: list[tuple[int, int, str]],
    pos_tags: list[str],
    mentions: list[tuple[int, int, int, int, str, str]],
) -> list[Token]:
    """Merge tokens inside each mention extent into one NNP/CD token whose
    position is the extent start (lexicalized-name analog of the user-term
    Lexicon injection, EntitySetIndexer.java:129-134)."""
    out: list[Token] = []
    i = 0
    n = len(tokens)
    spans = [(m[0], m[1], m[4]) for m in mentions]
    si = 0
    while i < n:
        s, e, w = tokens[i]
        while si < len(spans) and spans[si][1] <= s:
            si += 1
        if si < len(spans) and spans[si][0] <= s < spans[si][1]:
            ms, me, mtype = spans[si]
            parts = []
            j = i
            while j < n and tokens[j][0] < me:
                parts.append(tokens[j][2])
                j += 1
            pos = "CD" if mtype in ("NUMBER", "MONEY") else "NNP"
            out.append((ms, me, "_".join(parts), pos))
            i = j
        else:
            out.append((s, e, w, pos_tags[i]))
            i += 1
    return out


def _is_noun(tok: Token) -> bool:
    return tok[3].startswith(_NOUN_POS) or tok[3] == "CD"


def _is_verb(tok: Token) -> bool:
    return tok[3].startswith("VB") or tok[3] == "MD"


def parse_sentence(tokens: list[Token]) -> RelationSet:
    """Parse one sentence's (mention-collapsed) tokens into a RelationSet."""
    rs = RelationSet()
    n = len(tokens)
    if n == 0:
        return rs

    def rel(type_, src: Token, tgt: Token):
        rs.add(Rel(type_, src[2], src[0], src[3], tgt[2], tgt[0], tgt[3]))

    # verb groups: maximal runs of verb tokens (adverbs allowed inside)
    groups: list[list[int]] = []
    i = 0
    while i < n:
        if _is_verb(tokens[i]):
            g = [i]
            j = i + 1
            while j < n and (_is_verb(tokens[j]) or tokens[j][3] == "RB"):
                if _is_verb(tokens[j]):
                    g.append(j)
                j += 1
            groups.append(g)
            i = j
        else:
            i += 1

    if not groups:
        return rs

    for g in groups:
        first = tokens[g[0]]
        main = tokens[g[-1]]
        for a, b in zip(g, g[1:]):
            rel("vch", tokens[a], tokens[b])

        # subject: nearest noun left of the first verb
        subj = None
        for k in range(g[0] - 1, -1, -1):
            if _is_noun(tokens[k]):
                subj = tokens[k]
                break
            if _is_verb(tokens[k]):
                break
        if subj is not None:
            rel("nsubj", first, subj)

        # right side until the next verb group (or end)
        next_start = n
        gi = groups.index(g)
        if gi + 1 < len(groups):
            next_start = groups[gi + 1][0]

        pending_prep: Token | None = None
        comma_pending = False
        cc_pending = False
        poss_owner: Token | None = None
        last_np: Token | None = None
        obj_rel_idx: int | None = None  # index into rs.rels of the dobj, for retargeting
        k = g[-1] + 1
        while k < next_start:
            tok = tokens[k]
            pos = tok[3]
            if pos in ("DT",) or pos.startswith("JJ") or pos == "RB":
                k += 1
                continue
            if pos in ("IN", "TO"):
                pending_prep = tok
                comma_pending = cc_pending = False
                k += 1
                continue
            if pos == "POS":
                poss_owner = last_np
                k += 1
                continue
            if tok[2] == ",":
                comma_pending = True
                k += 1
                continue
            if pos == "CC":
                cc_pending = True
                k += 1
                continue
            if _is_noun(tok):
                if poss_owner is not None:
                    rel("poss", tok, poss_owner)
                    # the owner stood in for this NP in a prior attachment
                    if rs.rels and obj_rel_idx is not None and \
                            rs.rels[obj_rel_idx].target_posn == poss_owner[0]:
                        r = rs.rels[obj_rel_idx]
                        r.target_word, r.target_posn, r.target_pos = tok[2], tok[0], tok[3]
                    poss_owner = None
                    last_np = tok
                elif pending_prep is not None:
                    # attach prep to preceding common noun, else main verb
                    src = last_np if (last_np is not None and last_np[3] in ("NN", "NNS")) else main
                    rel("prep", src, pending_prep)
                    rel("pobj", pending_prep, tok)
                    pending_prep = None
                    last_np = tok
                elif comma_pending and last_np is not None:
                    rel("appos", last_np, tok)
                    comma_pending = False
                    last_np = tok
                elif cc_pending and last_np is not None:
                    rel("conj", last_np, tok)
                    cc_pending = False
                    last_np = tok
                elif last_np is None:
                    rel("dobj", main, tok)
                    obj_rel_idx = len(rs.rels) - 1
                    last_np = tok
                elif obj_rel_idx is not None and tokens[k - 1][0] == last_np[0]:
                    # double object: "gave Mary a book" → iobj Mary, dobj book
                    rs.rels[obj_rel_idx].type = "iobj"
                    rel("dobj", main, tok)
                    obj_rel_idx = len(rs.rels) - 1
                    last_np = tok
                else:
                    last_np = tok
                k += 1
                continue
            # other punctuation / symbols reset pending state
            comma_pending = cc_pending = False
            k += 1

    # sentence-final punctuation attaches to the first verb of the first group
    if tokens[-1][3] in (".", "!", "?"):
        rel("punct", tokens[groups[0][0]], tokens[-1])
    return rs
