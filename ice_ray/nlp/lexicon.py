"""Closed vocabularies for the deterministic NLP chain and the synthetic
transcripts corpus.

The reference loads JET model files (lexicon, HMM POS, ME name tagger —
src/props/parseprops:1-22) once per process; we replace them with
deterministic dictionaries built once per annotator actor (__init__), the
actor-pool analog of JetTest.initializeFromConfig
(IcePreprocessor.java:175).
"""

from __future__ import annotations

FIRST_NAMES = [
    "Fred", "Karl", "Mary", "Alice", "John", "Susan", "David", "Nancy",
    "Peter", "Laura", "Tom", "Emma", "Henry", "Grace", "Oscar", "Julia",
]

LAST_NAMES = [
    "Smith", "Jones", "Brown", "Taylor", "Wilson", "Davis", "Clark", "Lewis",
    "Walker", "Hall", "Young", "King", "Wright", "Scott", "Green", "Baker",
]

CITIES = [
    "Chicago", "Berlin", "Paris", "London", "Madrid", "Boston", "Denver",
    "Austin", "Seattle", "Atlanta", "Dallas", "Houston", "Phoenix",
    "Portland", "Miami", "Detroit",
]

COUNTRIES = [
    "Germany", "France", "Spain", "England", "Canada", "Brazil",
    "Japan", "Italy", "Poland", "Norway", "Sweden", "Egypt",
]

ORGS = [
    "Acme Corp", "Globex", "Initech", "Contoso", "Fabrikam", "Northwind",
    "Innotech", "Vertex Labs", "Orion Group", "Zenith Media",
]

# the reference's running domain is drug-related sets (FestTest.java:27-120
# builds a "drug-set"); small closed set of common-noun entities
DRUGS = ["heroin", "cocaine", "morphine", "opium"]

# verbs the heuristic POS tagger recognizes, keyed by base form
VERB_BASES = {
    "live", "visit", "die", "join", "promote", "work", "meet", "shoot",
    "move", "travel", "acquire", "announce", "say",
    "buy", "sell", "give", "seize", "pay", "hire",
    "report", "leave", "discuss", "review", "approve", "reject",
    # out-of-rule verbs for soft-decode tests (embedding-near / -far)
    "reside", "shun",
}

# common nouns for the no-mention filler templates (feed the term /
# PMI-index / expansion pipelines; not in the entity dictionary)
WORK_NOUNS = ["budget", "plan", "schedule", "proposal", "outage", "rollout"]
ACTOR_NOUNS = ["team", "manager", "committee", "board"]

# third-person subject/object pronouns the coref layer resolves
# (gender-free nearest-preceding-PERSON, the `resolve` stage analog —
# src/props/parseprops:24-30; RelaxedDepPathRelationTagger.java:69-70)
PRONOUNS = {"he", "she", "they", "him", "her", "them"}

# definite nominal anaphora (lowercase surface → entity type): "the
# company" resolves to the nearest preceding ORGANIZATION mention, "the
# director" to the nearest preceding PERSON — the nominal-mention side of
# the reference's `resolve` coref stage (src/props/parseprops:24-30; the
# pronoun rule above covers only the pronominal side).  Head nouns are
# DISJOINT from ACTOR_NOUNS/WORK_NOUNS so the no-mention filler templates
# (term/PMI pipelines) keep their plain-noun reading.
NOMINAL_ANAPHORA = {
    "the company": "ORGANIZATION",
    "the firm": "ORGANIZATION",
    "the director": "PERSON",
    "the officer": "PERSON",
}

# anaphor surfaces (lowercase) per resolvable entity type; the PERSON
# stream includes the pronouns
ANAPHORA_BY_TYPE: dict[str, frozenset] = {
    "PERSON": frozenset(PRONOUNS | {
        s for s, t in NOMINAL_ANAPHORA.items() if t == "PERSON"}),
    "ORGANIZATION": frozenset(
        s for s, t in NOMINAL_ANAPHORA.items() if t == "ORGANIZATION"),
}
ANAPHOR_TYPES = tuple(ANAPHORA_BY_TYPE)
ALL_ANAPHORA = frozenset().union(*ANAPHORA_BY_TYPE.values())

AUX_VERBS = {
    "is", "are", "was", "were", "am", "be", "been", "being",
    "has", "have", "had", "will", "would", "did", "does", "do",
}

PREPOSITIONS = {
    "in", "on", "at", "of", "from", "with", "by", "for", "near",
    "about", "into", "over", "under", "after", "before", "to",
}

DETERMINERS = {"a", "an", "the", "this", "that", "these", "those"}

CONJUNCTIONS = {"and", "or"}

ADVERBS = {"yesterday", "today", "tomorrow", "recently", "quickly", "soon"}

TIME_WORDS = {"yesterday", "today", "tomorrow"}

NUMBER_MULTIPLIERS = {"thousand": 1_000, "million": 1_000_000, "billion": 1_000_000_000}


def _phrase_key(phrase: str) -> tuple[str, ...]:
    return tuple(phrase.split(" "))


def build_entity_dict(extra_sets: dict[str, list[str]] | None = None) -> dict[tuple[str, ...], str]:
    """token-tuple → entity type; the onoma/EDT-type dictionary analog
    (models/JetEngineBuilder.java:140-156).  ``extra_sets`` lets user entity
    sets (A2/A3) extend the dictionary — type → list of phrases.
    """
    d: dict[tuple[str, ...], str] = {}
    for f in FIRST_NAMES:
        for l in LAST_NAMES:
            d[(f, l)] = "PERSON"
    # single-token surnames & first names resolve to PERSON too (linker
    # later canonicalizes them to the full form seen in the conversation)
    for l in LAST_NAMES:
        d[(l,)] = "PERSON"
    for f in FIRST_NAMES:
        d[(f,)] = "PERSON"
    for c in CITIES:
        d[(c,)] = "GPE"
    for c in COUNTRIES:
        d[(c,)] = "GPE"
    for o in ORGS:
        d[_phrase_key(o)] = "ORGANIZATION"
    for drug in DRUGS:
        d[(drug,)] = "DRUGS"
    # pronouns are PERSON mentions; the linker resolves them to the
    # nearest preceding PERSON in the conversation (or drops the edge)
    for p in PRONOUNS:
        d[(p,)] = "PERSON"
        d[(p.capitalize(),)] = "PERSON"
    # definite nominal anaphora ("the company" / "The company") are typed
    # mentions the linker resolves to the nearest preceding mention of
    # the same type (or drops the edge)
    for phrase, etype in NOMINAL_ANAPHORA.items():
        key = _phrase_key(phrase)
        d[key] = etype
        d[(key[0].capitalize(),) + key[1:]] = etype
    if extra_sets:
        for etype, phrases in extra_sets.items():
            for p in phrases:
                d[_phrase_key(p)] = etype
    return d


def max_entity_phrase_len(entity_dict: dict[tuple[str, ...], str]) -> int:
    return max((len(k) for k in entity_dict), default=1)


def lower_entity_dict(entity_dict: dict[tuple[str, ...], str]) -> dict[tuple[str, ...], str]:
    """Lowercase-keyed view for monocase documents (P2)."""
    return {tuple(w.lower() for w in k): v for k, v in entity_dict.items()}
