"""Per-turn annotation: sentence split → tokenize → POS → mentions →
mention collapse → dependency parse.

This is the JET NLP chain analog (``processDocument = sentenceSplit,
sentence:processSentence``; src/props/parseprops:24-30) as one pure
function over a turn's text.  It runs inside the Annotator actor pool
(stages/annotator.py); all models/dictionaries are passed in, built once
per actor.
"""

from __future__ import annotations

from ..nlp.depparse import collapse_mentions, parse_sentence
from ..nlp.ner import find_mentions
from ..nlp.postag import tag_token
from ..nlp.tokenizer import split_sentences, tokenize

Annotations = dict  # keys: sentences, tokens, mentions, deps


def annotate_text(text: str, entity_dict: dict, max_phrase_len: int,
                  lower_entity_dict: dict | None = None) -> Annotations:
    """→ {sentences: [(s,e)], tokens: [(s,e,word,pos)] (mention-collapsed),
    mentions: [(s,e,hs,he,type,mtype)], deps: [rel tuples]} with char
    offsets into ``text``.

    Monocase (P2, ``Ace.monocase = Ace.allLowerCase(doc)``,
    IcePreprocessor.java:213): when the turn contains no uppercase letter
    and ``lower_entity_dict`` is provided, NER folds case."""
    monocase = (lower_entity_dict is not None
                and not any(c.isupper() for c in text))
    sentences = split_sentences(text)
    all_tokens: list[tuple[int, int, str, str]] = []
    all_mentions: list[tuple[int, int, int, int, str, str]] = []
    deps: list[tuple] = []
    for ss, se in sentences:
        toks = tokenize(text, ss, se)
        if not toks:
            continue
        pos_tags = [tag_token(w, i == 0) for i, (_, _, w) in enumerate(toks)]
        if monocase:
            mentions = find_mentions(toks, lower_entity_dict, max_phrase_len,
                                     fold_case=True)
        else:
            mentions = find_mentions(toks, entity_dict, max_phrase_len)
        ctoks = collapse_mentions(toks, pos_tags, mentions)
        rs = parse_sentence(ctoks)
        all_tokens.extend(ctoks)
        all_mentions.extend(mentions)
        for r in rs.rels:
            deps.append((r.type, r.source_word, r.source_posn, r.source_pos,
                         r.target_word, r.target_posn, r.target_pos))
    return {
        "sentences": sentences,
        "tokens": all_tokens,
        "mentions": all_mentions,
        "deps": deps,
    }
