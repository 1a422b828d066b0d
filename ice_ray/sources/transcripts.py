"""Deterministic synthetic transcripts corpus + gold triples.

Schema per BASELINE.json.input_hint: (conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp[us]).  Templates model
the reference's test corpora (src/test/resources/tinyCorpus2/doc1.txt
"Fred Smith lives in Chicago."; tinyCorpus4 "Karl Smith died yesterday in
Berlin, Germany.") plus negatives that must yield no triples.

Generation is seeded per-conversation (seed, conv index) so any subset of
conversations is reproducible independently — the property that makes
partitioned regeneration and resume checks deterministic.  Gold triples
are derived directly from template instantiation (closed vocabulary);
the P/R harness compares pipeline output against them.
"""

from __future__ import annotations

import datetime as _dt
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..nlp.lexicon import (
    ACTOR_NOUNS,
    CITIES,
    COUNTRIES,
    DRUGS,
    FIRST_NAMES,
    LAST_NAMES,
    ORGS,
    WORK_NOUNS,
)

_EPOCH = _dt.datetime(2024, 1, 1)

# template id → (text pattern, gold predicate list)
# gold entries reference slots: P=person full name, P2=second person,
# C=city, CO=country, O=org, D=drug.  Subject surface may be the
# last-name variant; gold always carries the canonical full name —
# the linking + canonicalization stages must recover it.


def _mk_tool_text(rng: random.Random) -> str:
    return '{"status": "ok", "rows": %d, "tool": "search"}' % rng.randint(1, 99)


_FILLERS = [
    "Thanks for the update.",
    "The weather in {C} was pleasant.",
    "Please summarize the report.",
    "That sounds good to me.",
    "What happened next?",
]


def _long_sentence(rng: random.Random) -> str:
    # > 600 chars → sentence filter must drop it (DepPaths.java:305)
    words = " ".join("data point %d" % i for i in range(90))
    return "The log contains " + words + " in total."


def generate_conversation(conv_seed: int, conv_id: str, n_turns: int):
    """→ (turn rows, gold rows) for one conversation."""
    rng = random.Random(conv_seed)
    p1_full = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
    # second person with a distinct last name so the bare-surname variant
    # is unambiguous inside the conversation
    while True:
        p2_full = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        if p2_full.split()[1] != p1_full.split()[1] and p2_full != p1_full:
            break
    city = rng.choice(CITIES)
    city2 = rng.choice([c for c in CITIES if c != city])
    country = rng.choice(COUNTRIES)
    org = rng.choice(ORGS)
    drug = rng.choice(DRUGS)

    turns = []
    gold = []
    p1_introduced = False
    # coref tracking mirrors the linker's antecedent rule exactly: after a
    # template turn the "last person" is the rightmost non-anaphor PERSON
    # mention of that turn's edges (obj if the obj is a person, else the
    # subj); path-less turns with a PERSON mention (the bracket template)
    # also update it via @MENTION rows; anaphor surfaces (pronouns,
    # "the director") never move it.  Bare surnames count as mentions of
    # the resolved full name.  ``last_org`` tracks the rightmost
    # ORGANIZATION mention the same way for the nominal-anaphora
    # templates ("The company …" → that org).
    last_person: str | None = None
    last_org: str | None = None

    def person_surface(full: str, introduced: bool) -> str:
        if introduced and rng.random() < 0.25:
            return full.split()[1]  # bare surname; linker must resolve
        return full

    for turn_idx in range(n_turns):
        role = "user" if turn_idx % 2 == 0 else "assistant"
        tool = ""
        r = rng.random()
        g: list[tuple[str, str, str]] = []
        if r < 0.08:
            role, tool = "tool", "search"
            text = _mk_tool_text(rng)
        elif r < 0.16:
            text = rng.choice(_FILLERS).format(C=city2)
        elif r < 0.24:
            # no-mention noun/verb filler: feeds the term, PMI-index and
            # entity-set-expansion pipelines; yields no triples
            verb = rng.choice(["discussed", "reviewed", "approved", "rejected"])
            text = (f"The {rng.choice(ACTOR_NOUNS)} {verb} "
                    f"the {rng.choice(WORK_NOUNS)}.")
        elif r < 0.26:
            text = _long_sentence(rng)
        elif r < 0.28:
            # brackets → path extraction drops the sentence, but the
            # PERSON mention is still a coref antecedent (@MENTION row)
            text = f"The file (see notes) mentions {p1_full} and {city}."
            last_person = p1_full
        elif r < 0.34 and last_person is not None:
            # pronoun subject — the linker must resolve it to the nearest
            # preceding PERSON mention (gender-free, so any pronoun works)
            pron = rng.choice(["He", "She", "They"])
            pt = rng.randrange(3)
            if pt == 0:
                text = f"{pron} lives in {city}."
                g = [(last_person, "livesIn", city)]
            elif pt == 1:
                text = f"{pron} visited {city2}."
                g = [(last_person, "visited", city2)]
            else:
                text = f"{pron} joined {org}."
                g = [(last_person, "memberOf", org)]
                last_org = org  # non-anaphor ORG mention (obj)
        elif r < 0.38 and last_person is not None:
            # definite nominal PERSON anaphor — "the director"/"the
            # officer" resolves to the nearest preceding PERSON mention
            if rng.random() < 0.5:
                text = f"The director visited {city2}."
                g = [(last_person, "visited", city2)]
            else:
                text = f"The officer lives in {city}."
                g = [(last_person, "livesIn", city)]
        elif r < 0.42 and last_org is not None:
            # definite nominal ORGANIZATION anaphor — "the company"/"the
            # firm" resolves to the nearest preceding ORGANIZATION mention
            nom = rng.choice(["The company", "The firm"])
            pers = rng.choice([p1_full, p2_full])
            text = f"{nom} promoted {pers}."
            g = [(last_org, "promoted", pers)]
            last_person = pers  # rightmost non-anaphor PERSON mention (obj)
        else:
            t = rng.randrange(10)
            p1 = person_surface(p1_full, p1_introduced)
            if t == 0:
                text = f"{p1} lives in {city}."
                g = [(p1_full, "livesIn", city)]
            elif t == 1:
                text = f"{p1} has lived in {city}."
                g = [(p1_full, "livesIn", city)]
            elif t == 2:
                text = f"{p1} visited {city2}."
                g = [(p1_full, "visited", city2)]
            elif t == 3:
                text = f"{p1} died yesterday in {city}, {country}."
                g = [(p1_full, "diedIn", city), (city, "locatedIn", country)]
            elif t == 4:
                text = f"{p1} was shot in {city2}."
                g = [(p1_full, "shotIn", city2)]
            elif t == 5:
                text = f"{p1} joined {org}."
                g = [(p1_full, "memberOf", org)]
            elif t == 6:
                text = f"{org} promoted {p1}."
                g = [(org, "promoted", p1_full)]
            elif t == 7:
                text = f"{p1} works for {org}."
                g = [(p1_full, "worksFor", org)]
            elif t == 8:
                text = f"{p1} met {p2_full} in {city}."
                g = [(p1_full, "met", p2_full)]
            else:
                text = f"{p1} seized a pound of {drug}."
                g = [(p1_full, "seized", drug)]
            p1_introduced = p1_introduced or (p1 == p1_full)
            last_person = p2_full if t == 8 else p1_full
            if t in (5, 6, 7):
                last_org = org  # the turn's ORGANIZATION mention
        ts = _EPOCH + _dt.timedelta(seconds=conv_seed % 86400 + turn_idx * 37)
        turns.append((conv_id, turn_idx, role, text, tool, ts))
        for s, p, o in g:
            gold.append((conv_id, turn_idx, s, p, o))
    return turns, gold


def _conv_sizes(n_turns: int, seed: int) -> list[int]:
    """Zipf(1.1)-ish turn counts so hot conversations exist at every scale
    (the skew axis per FIXTURES.md)."""
    if n_turns <= 0:
        return []
    rs = np.random.RandomState(seed)
    sizes: list[int] = []
    total = 0
    while total < n_turns:
        z = int(min(rs.zipf(1.8), 200))  # heavy tail, capped
        z = max(z, 2)
        sizes.append(z)
        total += z
    sizes[-1] -= total - n_turns
    if sizes[-1] < 1:
        sizes.pop()
    return sizes


def generate_transcripts(n_turns: int, seed: int = 42):
    """→ (transcripts pyarrow.Table, gold pyarrow.Table)."""
    sizes = _conv_sizes(n_turns, seed)
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    g_conv, g_turn, g_s, g_p, g_o = [], [], [], [], []
    for ci, sz in enumerate(sizes):
        conv_id = f"conv-{ci:07d}"
        turns, gold = generate_conversation(seed * 1_000_003 + ci, conv_id, sz)
        for c, t, r, x, tl, ts in turns:
            conv_ids.append(c); turn_idxs.append(t); roles.append(r)
            texts.append(x); tools.append(tl); tss.append(ts)
        for c, t, s, p, o in gold:
            g_conv.append(c); g_turn.append(t); g_s.append(s); g_p.append(p); g_o.append(o)
    transcripts = pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })
    gold = pa.table({
        "conv_id": pa.array(g_conv, pa.string()),
        "turn_idx": pa.array(g_turn, pa.int32()),
        "subj": pa.array(g_s, pa.string()),
        "pred": pa.array(g_p, pa.string()),
        "obj": pa.array(g_o, pa.string()),
    })
    return transcripts, gold


def materialize_corpus(n_turns: int, seed: int = 42, base_dir: str = "/tmp/ice_ray_corpus",
                       shard_rows: int = 100_000) -> str:
    """Write (once) a transcripts corpus + gold to parquet under a
    parameter-keyed directory; returns the directory.  Sharded with small
    row groups so Ray's read splits into many blocks (row-group
    granularity bounds read parallelism); cached across runs."""
    # v5: nominal-anaphora templates ("The company promoted …",
    # "The director visited …") join the pronoun templates (was v4:
    # bracket-turn mentions as coref antecedents)
    out = os.path.join(base_dir, f"turns{n_turns}_seed{seed}_v5")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(os.path.join(out, "transcripts"), exist_ok=True)
    transcripts, gold = generate_transcripts(n_turns, seed)
    for i in range(0, max(transcripts.num_rows, 1), shard_rows):
        pq.write_table(transcripts.slice(i, shard_rows),
                       os.path.join(out, "transcripts", f"part-{i // shard_rows:05d}.parquet"),
                       row_group_size=8192)
    pq.write_table(gold, os.path.join(out, "gold.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return out
