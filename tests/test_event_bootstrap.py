"""Event-pattern bootstrap (events/EventBootstrap.java:236-409):
seed tree signatures → shared-argument candidate trees → s/t · s/(s+1)
ranking, 0.05 floor, cap 100, repr-dedup."""

import pyarrow as pa

import ray.data
from ice_ray.pipelines.events import (
    event_bootstrap_score,
    event_bootstrap_shared_args,
    extract_trees,
)


def _turns(texts, conv_id="c0"):
    n = len(texts)
    return ray.data.from_arrow(pa.table({
        "conv_id": pa.array([conv_id] * n, pa.string()),
        "turn_idx": pa.array(range(n), pa.int32()),
        "text": pa.array(texts, pa.string()),
    }))


def test_cooccurring_trigger_recovered(ray_session):
    """A verb sharing its (nsubj, dobj) pair with the seed trigger is
    recovered with the reference score s/t · s/(s+1)."""
    ds = _turns([
        "The manager discussed the budget.",
        "The manager approved the budget.",      # shares manager:budget
        "The director rejected the proposal.",   # no shared pair
    ])
    trees = extract_trees(ds, emit_args=True)
    out = event_bootstrap_shared_args(
        trees, seed_cores=["discuss nsubj:OTHER dobj:OTHER"])
    assert list(out["pcore"]) == ["approve nsubj:OTHER dobj:OTHER"]
    # s=1 shared pair, t=1 total pair for 'approve' → 1/1 · 1/2 = 0.5
    assert out["score"].iloc[0] == 0.5
    assert out["n_shared_pairs"].iloc[0] == 1
    assert out["n_total_pairs"].iloc[0] == 1
    assert out["repr"].iloc[0] == "manager approved budget"


def test_score_floor_and_totals(ray_session):
    """A candidate whose trigger connects many OTHER pairs is diluted by
    totalCount; below MIN_BOOTSTRAP_SCORE=0.05 it is dropped."""
    texts = ["The manager discussed the budget.",
             "The manager reviewed the budget."]
    # 30 extra 'reviewed' pairs not shared with the seed → t=31, s=1
    nouns = ["plan", "report", "design", "draft", "memo", "poster",
             "survey", "ticket", "invoice", "ledger"]
    for i in range(30):
        texts.append(f"The director reviewed the {nouns[i % 10]} {i}.")
    ds = _turns(texts)
    trees = extract_trees(ds, emit_args=True)
    out = event_bootstrap_shared_args(
        trees, seed_cores=["discuss nsubj:OTHER dobj:OTHER"])
    # score = 1/31 · 1/2 ≈ 0.016 < 0.05 → filtered by the floor
    assert "review nsubj:OTHER dobj:OTHER" not in set(out["pcore"])
    lo = event_bootstrap_shared_args(
        trees, seed_cores=["discuss nsubj:OTHER dobj:OTHER"], min_score=0.0)
    row = lo[lo["pcore"] == "review nsubj:OTHER dobj:OTHER"].iloc[0]
    assert row["n_shared_pairs"] == 1
    assert row["score"] == round(
        event_bootstrap_score(1, int(row["n_total_pairs"])), 6)


def test_no_seed_instances_returns_none(ray_session):
    ds = _turns(["The manager approved the budget."])
    trees = extract_trees(ds, emit_args=True)
    assert event_bootstrap_shared_args(
        trees, seed_cores=["discuss nsubj:OTHER dobj:OTHER"]) is None


def test_repr_dedup_and_rejects(ray_session):
    """Candidates whose first-wins repr duplicates a higher-ranked one
    are dropped; rejected signatures never come back."""
    ds = _turns([
        "The manager discussed the budget.",
        "The manager approved the budget.",
        "The manager reviewed the budget.",
    ])
    trees = extract_trees(ds, emit_args=True).materialize()
    out = event_bootstrap_shared_args(
        trees, seed_cores=["discuss nsubj:OTHER dobj:OTHER"])
    assert set(out["pcore"]) == {"approve nsubj:OTHER dobj:OTHER",
                                 "review nsubj:OTHER dobj:OTHER"}
    out2 = event_bootstrap_shared_args(
        trees, seed_cores=["discuss nsubj:OTHER dobj:OTHER"],
        rejects={"approve nsubj:OTHER dobj:OTHER"})
    assert set(out2["pcore"]) == {"review nsubj:OTHER dobj:OTHER"}
