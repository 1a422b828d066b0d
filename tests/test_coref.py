"""Pronoun coreference: conversation-scoped nearest-preceding-PERSON
resolution (gender-free), the `resolve` stage analog of the reference NLP
chain (src/props/parseprops:24-30; coref merge in
aceJet/RelaxedDepPathRelationTagger.java:69-70).

Covers: direct antecedent, antecedent via bare surname, antecedent = the
rightmost person of a multi-person turn (obj of "met"), unresolved
pronoun (dropped), and equality of broadcast vs shuffle link strategies.
"""

import datetime as dt

import pyarrow as pa
import pytest

import ray.data
from ice_ray.config import PipelineConfig
from ice_ray.pipelines.kg import build_kg

_TS = dt.datetime(2024, 1, 1)


def _conv(conv_id, texts):
    n = len(texts)
    return {
        "conv_id": [conv_id] * n,
        "turn_idx": list(range(n)),
        "role": ["user"] * n,
        "text": texts,
        "tool": [""] * n,
        "ts": [_TS + dt.timedelta(seconds=i) for i in range(n)],
    }


def _build(texts, strategy="broadcast", conv_id="c0"):
    tbl = pa.table({k: pa.array(v) if k != "turn_idx"
                    else pa.array(v, pa.int32())
                    for k, v in _conv(conv_id, texts).items()})
    cfg = PipelineConfig(link_strategy=strategy)
    edges = build_kg(ray.data.from_arrow(tbl), cfg=cfg).to_pandas()
    return set(zip(edges.subj, edges.pred, edges.obj))


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_pronoun_resolves_to_nearest_person(ray_session, strategy):
    triples = _build([
        "Fred Smith lives in Chicago.",
        "He visited Paris.",            # He → Fred Smith
        "She joined Globex.",           # gender-free: She → Fred Smith too
    ], strategy)
    assert ("Fred Smith", "visited", "Paris") in triples
    assert ("Fred Smith", "memberOf", "Globex") in triples


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_pronoun_after_bare_surname_and_met(ray_session, strategy):
    triples = _build([
        "Fred Smith lives in Chicago.",
        "Smith visited Paris.",          # bare surname → Fred Smith
        "They lives in Berlin.",         # They → Fred Smith (via surname)
        "Fred Smith met Mary Jones in Boston.",
        "He joined Globex.",             # rightmost person of met turn = Mary Jones
    ], strategy)
    assert ("Fred Smith", "livesIn", "Berlin") in triples
    assert ("Mary Jones", "memberOf", "Globex") in triples


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_unresolved_pronoun_dropped(ray_session, strategy):
    triples = _build([
        "He lives in Chicago.",          # no antecedent anywhere → dropped
        "Fred Smith visited Paris.",
    ], strategy)
    assert ("Fred Smith", "visited", "Paris") in triples
    assert not any(s.lower() in {"he", "she", "they"} for s, _, _ in triples)
    assert ("Fred Smith", "livesIn", "Chicago") not in triples  # turn-0 pronoun must NOT see a later mention


def test_pronoun_scoped_to_conversation(ray_session):
    # two conversations: the pronoun in c1 must not see c0's person
    rows = []
    t0 = _conv("c0", ["Fred Smith lives in Chicago."])
    t1 = _conv("c1", ["Karl Brown lives in Berlin.", "He visited Paris."])
    tbl = pa.table({
        k: pa.array(t0[k] + t1[k]) if k != "turn_idx"
        else pa.array(t0[k] + t1[k], pa.int32())
        for k in t0
    })
    edges = build_kg(ray.data.from_arrow(tbl)).to_pandas()
    triples = set(zip(edges.subj, edges.pred, edges.obj))
    assert ("Karl Brown", "visited", "Paris") in triples
    assert ("Fred Smith", "visited", "Paris") not in triples


def test_pronoun_broadcast_and_shuffle_paths_equal(ray_session):
    """The mention-broadcast fast path and the bucketed-exchange scale
    path of resolve_pronoun_edges produce identical edges."""
    import ray.data
    from ice_ray.pipelines.kg import decode_edges, extract_paths
    from ice_ray.stages.linker import resolve_pronoun_edges
    from ice_ray.sources.transcripts import generate_transcripts

    tr, _ = generate_transcripts(1500, seed=11)
    edges = decode_edges(
        extract_paths(ray.data.from_arrow(tr), emit_repr=False)).materialize()

    def canon(ds):
        df = ds.to_pandas()
        return set(map(tuple, df[["subj", "pred", "obj", "conv_id",
                                  "turn_idx"]].itertuples(index=False)))

    fast = canon(resolve_pronoun_edges(edges))
    slow = canon(resolve_pronoun_edges(edges, mention_broadcast_max=0))
    assert fast == slow and len(fast) > 0


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_antecedent_from_relation_less_turn(ray_session, strategy):
    """The antecedent may appear only in a turn that yields NO relation
    (bracketed sentence → path extraction drops it, but the PERSON
    mention rides an @MENTION row into the coref pass)."""
    triples = _build([
        "The file (see notes) mentions Fred Smith and Chicago.",
        "He visited Paris.",
    ], strategy)
    assert ("Fred Smith", "visited", "Paris") in triples


def test_canonicalize_cap_paths_equal(ray_session):
    """canonicalize_edges takes three broadcast-path routes depending on
    the mention cap: speculative refs-only (default), non-speculative
    filtered pull, and the bucketed-exchange fallback (cap 0).  All must
    produce identical edges — the small caps force the code paths that
    otherwise only run at 10^7+ edges."""
    import pandas as pd

    from ice_ray.pipelines.kg import canonicalize_edges, dedup_edges, extract_decode_edges
    from ice_ray.sources.transcripts import generate_transcripts

    tbl, _ = generate_transcripts(4000, seed=11)
    ds = ray.data.from_arrow(tbl.select(["conv_id", "turn_idx", "text"]))
    edges = extract_decode_edges(ds).materialize()

    def run(cap):
        out = dedup_edges(canonicalize_edges(edges, mention_cap=cap)).to_pandas()
        cols = sorted(out.columns)
        return out[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)

    # a cap below 2×edges forces the non-speculative route; prove the
    # FILTERED pull actually succeeds at mid_cap (≠ the fallback route)
    from ice_ray.stages.linker import build_link_state, build_mention_index

    n_edges = edges.count()
    mid_cap = 2 * n_edges - 1
    _, _, pron_convs = build_link_state(edges)
    assert pron_convs
    assert build_mention_index(edges, pron_convs, mid_cap) is not None

    spec = run(16_000_000)          # speculative refs-only path
    nonspec = run(mid_cap)          # non-speculative: filtered pull succeeds
    fallback = run(0)               # pull cap 0 → bucketed mention exchange
    assert len(spec) > 0
    pd.testing.assert_frame_equal(spec, nonspec)
    pd.testing.assert_frame_equal(spec, fallback)


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_nominal_org_anaphora(ray_session, strategy):
    """"The company"/"The firm" (ORGANIZATION nominal) resolves to the
    nearest preceding ORGANIZATION mention — the nominal-mention side of
    the reference's resolve stage (src/props/parseprops:24-30)."""
    triples = _build([
        "Fred Smith joined Globex.",
        "The company promoted Mary Jones.",   # → Globex
        "The firm promoted Karl Brown.",      # → Globex
    ], strategy)
    assert ("Globex", "promoted", "Mary Jones") in triples
    assert ("Globex", "promoted", "Karl Brown") in triples
    assert not any(s.lower() in {"the company", "the firm"}
                   for s, _, _ in triples)


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_nominal_person_anaphora(ray_session, strategy):
    """"The director"/"The officer" (PERSON nominal) resolves to the
    nearest preceding PERSON mention; ORG mentions do not shadow it."""
    triples = _build([
        "Acme Corp promoted Mary Jones.",
        "The director visited Paris.",        # → Mary Jones (not Acme)
        "Fred Smith joined Globex.",
        "The officer lives in Chicago.",      # → Fred Smith
    ], strategy)
    assert ("Mary Jones", "visited", "Paris") in triples
    assert ("Fred Smith", "livesIn", "Chicago") in triples


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_nominal_type_streams_are_independent(ray_session, strategy):
    """A PERSON nominal must NOT resolve to an ORGANIZATION antecedent
    and vice versa; with no type-compatible antecedent the edge drops."""
    triples = _build([
        "Fred Smith lives in Chicago.",
        "The company promoted Mary Jones.",   # no ORG antecedent → dropped
        "The director visited Paris.",        # → Mary Jones (her mention
        # survives the dropped edge — discourse antecedents come from
        # mentions, not from surviving edges)
    ], strategy)
    assert ("Mary Jones", "visited", "Paris") in triples
    assert not any(p == "promoted" for _, p, _ in triples)
    assert not any(s == "The company" for s, _, _ in triples)


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_nominal_and_pronoun_interleave(ray_session, strategy):
    """The person promoted by "The company" becomes the pronoun
    antecedent for the next turn (the obj mention moves last-person)."""
    triples = _build([
        "Fred Smith joined Globex.",
        "The company promoted Mary Jones.",
        "She visited Berlin.",                # She → Mary Jones
    ], strategy)
    assert ("Globex", "promoted", "Mary Jones") in triples
    assert ("Mary Jones", "visited", "Berlin") in triples
