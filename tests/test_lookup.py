"""HashedStringMap (flat-array broadcast lookup) unit tests + canon
finish equivalence vs the naive per-surface reduction."""

import numpy as np
import pandas as pd
import pytest

from ice_ray.functions.lookup import HashedStringMap
from ice_ray.stages.linker import _canon_from_counts, _norm_surface


def test_lookup_matches_dict():
    rng = np.random.default_rng(7)
    keys = np.array([f"c{i % 997}\x01K{i}" for i in range(50_000)],
                    dtype=object)
    vals = np.array([f"V{i}" for i in range(50_000)], dtype=object)
    d = dict(zip(keys, vals))
    m = HashedStringMap(keys, vals)
    probe = np.concatenate([keys[rng.integers(0, len(keys), 2000)],
                            np.array([f"miss{i}" for i in range(500)],
                                     dtype=object)])
    rng.shuffle(probe)
    fb = np.array([f"fb{i}" for i in range(len(probe))], dtype=object)
    got = m.lookup(probe, fb)
    want = np.array([d.get(p, f) for p, f in zip(probe, fb)], dtype=object)
    assert (got == want).all()


def test_lookup_from_dict_and_empty():
    m = HashedStringMap({"a": "1", "b": "2"})
    assert m.get("a") == "1" and m.get("zz", "x") == "x"
    e = HashedStringMap()
    out = e.lookup(np.array(["a"], dtype=object),
                   np.array(["f"], dtype=object))
    assert out[0] == "f" and len(e) == 0


def test_canon_from_counts_matches_naive():
    surf = np.array(["Alice Jones", "alice jones", "Alice  Jones",
                     "Bob Ray", "BOB RAY", "Bob Ray", "Solo Name",
                     "x", "X", "x"], dtype=object)
    n = np.array([3, 5, 1, 2, 2, 1, 9, 1, 1, 1], dtype=np.int64)
    canon = _canon_from_counts(surf, n)
    # naive reference: full map incl. identity norms
    agg: dict = {}
    for s_, n_ in zip(surf, n):
        agg[s_] = agg.get(s_, 0) + int(n_)
    best: dict = {}
    for s_, n_ in agg.items():
        k = _norm_surface(s_)
        cur = best.get(k)
        if cur is None or (-n_, s_) < (-cur[0], cur[1]):
            best[k] = (n_, s_)
    full = {k: s_ for k, (_, s_) in best.items()}
    # probing any counted surface gives identical results either way
    for s_ in agg:
        k = _norm_surface(s_)
        assert canon.get(k, s_) == full.get(k, s_)
    # identity-only norms are absent from the shrunken map
    assert "solo name" not in canon
    assert canon["alice jones"] == "alice jones"  # most frequent variant
    assert canon["bob ray"] == "Bob Ray"          # 3 occurrences beats 2


def test_mention_index_from_arrow_matches_from_rows():
    import pyarrow as pa

    from ice_ray.stages.linker import MentionIndex

    rng = np.random.default_rng(3)
    n = 20_000
    convs = np.array([f"c{int(i)}" for i in rng.integers(0, 900, n)],
                     dtype=object)
    keys = rng.integers(0, 200, n).astype(np.int64)
    names = np.array([f"Name {int(i)}" for i in rng.integers(0, 50, n)],
                     dtype=object)
    m = pd.DataFrame({"conv_id": convs, "_key": keys, "_name": names})
    t = pa.table({"conv_id": pa.array(convs, pa.string()),
                  "_key": pa.array(keys),
                  "_name": pa.array(names, pa.string())})
    conv_set = {f"c{i}" for i in range(0, 900, 3)}
    for cs in (None, conv_set):
        a = MentionIndex.from_rows(m, conv_set=cs)
        b = MentionIndex.from_arrow(t, conv_set=cs)
        q_convs = np.array([f"c{i}" for i in range(0, 950, 7)] * 4,
                           dtype=object)
        q_turns = np.tile(np.array([0, 5, 50, 120], dtype=np.int64),
                          len(q_convs) // 4)
        ra, rb = a.resolve(q_convs, q_turns), b.resolve(q_convs, q_turns)
        assert (pd.Series(ra).fillna("-") == pd.Series(rb).fillna("-")).all()
        assert np.array_equal(a.gkeys, b.gkeys)
        assert list(a.pool[a.codes]) == list(b.pool[b.codes])


def test_lookup_collision_runs_exact(monkeypatch):
    """Force hash collisions (weak patched hash) to exercise the
    duplicate-hash run scan — lookups stay exact."""
    import ice_ray.functions.lookup as lk

    def weak_hash(keys):
        return np.array([len(k) % 3 for k in keys], dtype=np.uint64)

    monkeypatch.setattr(lk, "_hash", weak_hash)
    keys = np.array(["a", "bb", "cc", "ddd", "eeee", "x"], dtype=object)
    vals = np.array(["1", "2", "3", "4", "5", "6"], dtype=object)
    m = lk.HashedStringMap(keys, vals)
    d = dict(zip(keys, vals))
    probe = np.array(["a", "bb", "cc", "zz", "ddd", "eeee", "x", "yy"],
                     dtype=object)
    fb = np.array([f"f{i}" for i in range(len(probe))], dtype=object)
    got = m.lookup(probe, fb)
    want = np.array([d.get(p, f) for p, f in zip(probe, fb)], dtype=object)
    assert (got == want).all()
