"""Ports of the reference's DepPathsTest cases
(src/test/java/edu/nyu/jet/ice/models/DepPathsTest.java:36-130): literal
dependency triples through transform → BFS → regularize → path string,
asserting the golden path strings."""

from ice_ray.core.deppath import (
    DepPath,
    Rel,
    RelationSet,
    build_syntactic_path,
    linearize,
    normalize_repr,
    path_string,
    regularize,
    transform,
)


def _pos_at_factory(rels: RelationSet):
    pos = {}
    for r in rels.rels:
        pos.setdefault(r.source_posn, r.source_pos)
        pos.setdefault(r.target_posn, r.target_pos)

    def pos_at(p):
        return pos.get(p, "?")

    return pos_at


def test_svo():
    # "Fred Smith visited Chicago." (DepPathsTest.java:36-62)
    rels = RelationSet.from_text(
        "nsubj | visited | 11 | VBD | Fred_Smith | 0 | NNP\n"
        "dobj | visited | 11 | VBD | Chicago | 19 | NNP\n"
        "punct | visited | 11 | VBD | . | 27 | .\n"
    )
    t = transform(rels.deep_copy())
    t.add_inverses()
    path = build_syntactic_path(0, 19, (0, 11), (19, 27), t, [])
    assert path is not None
    assert path_string(path) == "nsubj-1:visit:dobj"
    reg = regularize(path)
    lin = linearize(reg, t, _pos_at_factory(t), "PERSON", "GPE")
    # stem=False (as recordPaths calls it, DepPaths.java:410) keeps surfaces
    assert normalize_repr(lin) == "person visited gpe"


def test_vch_prep():
    # "Fred Smith has lived in Chicago." (DepPathsTest.java:64-96)
    rels = RelationSet.from_text(
        "nsubj | has | 11 | VBZ | Fred_Smith | 0 | NNP\n"
        "vch | has | 11 | VBZ | lived | 15 | VBN\n"
        "prep | lived | 15 | VBN | in | 21 | IN\n"
        "pobj | in | 21 | IN | Chicago | 24 | NNP\n"
        "punct | has | 11 | VBZ | . | 32 | .\n"
    )
    t = transform(rels.deep_copy())
    t.add_inverses()
    path = build_syntactic_path(0, 24, (0, 11), (24, 32), t, [])
    assert path is not None
    assert path_string(path) == "nsubj-1:live:prep:in:pobj"


def test_passive():
    # "Fred Smith was shot in Chicago." (DepPathsTest.java:98-130)
    rels = RelationSet.from_text(
        "nsubj | was | 11 | VBD | Fred_Smith | 0 | NNP\n"
        "vch | was | 11 | VBD | shot | 15 | VBN\n"
        "prep | shot | 15 | VBN | in | 20 | IN\n"
        "pobj | in | 20 | IN | Chicago | 23 | NNP\n"
        "punct | was | 11 | VBZ | . | 30 | .\n"
    )
    t = transform(rels.deep_copy())
    t.add_inverses()
    raw = rels.deep_copy()
    raw.add_inverses()
    t_path = build_syntactic_path(0, 23, (0, 11), (23, 30), t, [])
    assert t_path is not None
    assert path_string(t_path) == "nsubj-1:shoot:prep:in:pobj"
    # raw (untransformed) path keeps the verb chain
    raw_path = build_syntactic_path(0, 23, (0, 11), (23, 30), raw, [])
    assert raw_path is not None
    assert path_string(raw_path) == "nsubj-1:be:vch:shoot:prep:in:pobj"


def test_regularizer_quantifier():
    # 'Q of X' deletion (DepPathRegularizer.java:40-73): a path through
    # "pound of heroin" merges the quantifier hop.
    p = DepPath(0, 30, (0, 10), (30, 36), [
        Rel("nsubj-1", "Fred_Smith", 0, "NNP", "seized", 11, "VBD"),
        Rel("dobj", "seized", 11, "VBD", "pound", 20, "NN"),
        Rel("prep", "pound", 20, "NN", "of", 26, "IN"),
        Rel("pobj", "of", 26, "IN", "heroin", 30, "NN"),
    ])
    reg = regularize(p)
    types = [r.type for r in reg.relations]
    assert types == ["nsubj-1", "dobj", "pobj"]
    assert path_string(reg) == "nsubj-1:seize:dobj:of:pobj"


def test_path_length_via_disallowed():
    # disallowed labels block BFS expansion (DepPaths.java:112-123)
    rels = RelationSet.from_text(
        "conj | visited | 11 | VBD | lived | 30 | VBD\n"
        "nsubj | visited | 11 | VBD | Fred | 0 | NNP\n"
        "dobj | lived | 30 | VBD | Chicago | 40 | NNP\n"
    )
    rels.add_inverses()
    assert build_syntactic_path(0, 40, (0, 4), (40, 47), rels, []) is None


def test_mention_head_blocks_path():
    # a path may not pass through another mention head (DepPaths.java:451-455)
    rels = RelationSet.from_text(
        "nsubj | met | 10 | VBD | Fred | 0 | NNP\n"
        "dobj | met | 10 | VBD | Mary | 14 | NNP\n"
        "appos | Mary | 14 | NNP | Chicago | 20 | NNP\n"
    )
    rels.add_inverses()
    # Fred → Chicago must go through Mary's head (14) which is a local mention
    assert build_syntactic_path(0, 20, (0, 4), (20, 27), rels, [(14, 18)]) is None
    # without the blocking mention the path exists
    p = build_syntactic_path(0, 20, (0, 4), (20, 27), rels, [])
    assert p is not None
    assert path_string(p) == "nsubj-1:meet:dobj:mary:appos"
