"""Gold-parquet integrity: the committed gold files stay in sync with
the generator (ice_ray/oracle.py) and cover the scale factors the
driver's correctness gate uses.  Full query-vs-gold comparison lives in
test_queries_oracle.py; this catches oracle.py edits without a regen."""

import os

import pandas as pd
import pyarrow.parquet as pq

from ice_ray.oracle import (
    GOLD_DIR,
    docs_fingerprint,
    emb_fingerprint,
    gold_kg_edges,
    gold_soft_decode,
)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def test_template_gold_matches_committed():
    committed = pq.read_table(
        os.path.join(GOLD_DIR, "synth", "kg_edges.parquet")).to_pandas()
    fresh = gold_kg_edges()
    pd.testing.assert_frame_equal(committed, fresh)
    committed_sd = pq.read_table(
        os.path.join(GOLD_DIR, "synth", "soft_decode.parquet")).to_pandas()
    pd.testing.assert_frame_equal(committed_sd, gold_soft_decode())


def test_gold_dirs_exist_for_driver_sfs():
    for sf in SF_DIRS:
        dkey = os.path.join(GOLD_DIR, f"docs_{docs_fingerprint(sf)}")
        ekey = os.path.join(GOLD_DIR, f"emb_{emb_fingerprint(sf)}")
        nev = pq.read_metadata(f"{sf}/events.parquet").num_rows
        assert os.path.isfile(os.path.join(dkey, "minhash_neardup.parquet")), dkey
        assert os.path.isfile(os.path.join(ekey, "knn_lsh.parquet")), ekey
        assert os.path.isfile(os.path.join(
            GOLD_DIR, f"events{nev}", "approx_distinct_users.parquet"))


def test_all_synth_golds_present_and_nonempty():
    for name in ["kg_edges", "path_type_counts", "path_instance_counts",
                 "tree_counts", "events_decoded", "annotations", "ice_terms",
                 "pmi_index", "bootstrap_candidates",
                 "event_bootstrap_candidates", "soft_decode"]:
        p = os.path.join(GOLD_DIR, "synth", f"{name}.parquet")
        assert pq.read_metadata(p).num_rows > 0, name


def test_independent_spec_implementations_agree_with_kernels():
    """The round-3 independent golds (bit-level simhash, regex-free BPE
    scanner, spec quality/lang-id) agree with the stage kernels on
    adversarial strings — a change to either side must break this."""
    from ice_ray.oracle import (
        _bpe_count_scan,
        _lang_id_spec,
        _quality_spec,
        _simhash64_bitlevel,
    )
    from ice_ray.stages.dedup import SimHasher
    from ice_ray.stages.textstats import _BPE_RE, _LANG_PROFILES

    cases = ["", " ", "  ", "a  b", "it's", "IT'S", "don't've", "x\n\ny",
             "  'll", "a\tb", "...", " ... ", "word1 2word", "a \n b",
             "trailing   ", "\n", "mix'd42!!'s", "der der die und das ist",
             "the and of to in is that", "¡hola! ¿qué? el la de que y",
             "a\x0bb", "tab\ttab\x0c", "naïve café — fin", "é", "¿?"]
    import numpy as np
    for t in cases:
        assert _bpe_count_scan(t) == len(_BPE_RE.findall(t)), repr(t)
        assert _simhash64_bitlevel(t) == SimHasher.simhash64(t), repr(t)
        import pyarrow as pa

        from ice_ray.stages.textstats import LangId, quality_score
        tbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                        "text": pa.array([t])})
        assert _quality_spec(t) == quality_score(tbl)["quality"][0].as_py(), repr(t)
        assert _lang_id_spec(t) == LangId()(tbl)["lang_pred"][0].as_py(), repr(t)


def test_template_grammar_golds_match_serial_reference():
    """Round-4 oracle-rigor swap: the template-grammar golds
    (gold_templates.py — hand-pinned rows per corpus sentence shape, no
    shared extraction code) must equal the serial-reference golds row
    for row.  A change to the corpus grammar, the extractor, or the
    pinned expectations breaks this from one side or the other."""
    from ice_ray import gold_templates as gt
    from ice_ray import oracle as o

    def canon(df, keys):
        return (df.sort_values(keys, kind="mergesort")
                .reset_index(drop=True))

    pairs = [
        (o.gold_path_type_counts(), gt.gold_path_type_counts_template(),
         ["typed_path"]),
        (o.gold_path_instance_counts(),
         gt.gold_path_instance_counts_template(), ["instance_key"]),
        (o.gold_tree_counts(), gt.gold_tree_counts_template(), ["core"]),
        (o.gold_events_decoded(), gt.gold_events_decoded_template(),
         ["conv_id", "turn_idx", "core"]),
        (o.gold_bootstrap_candidates(),
         gt.gold_bootstrap_candidates_template(), ["path"]),
        (o.gold_event_bootstrap_candidates(),
         gt.gold_event_bootstrap_candidates_template(), ["pcore"]),
        (o.gold_annotations(), gt.gold_annotations_template(),
         ["conv_id", "turn_idx"]),
        (o.gold_ice_terms(), gt.gold_ice_terms_template(), ["term"]),
        (o.gold_pmi_index(), gt.gold_pmi_index_template(), ["term", "ctx"]),
    ]
    for serial, templ, keys in pairs:
        a, b = canon(serial, keys), canon(templ, keys)[serial.columns.tolist()]
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                      check_like=True)


def test_template_rows_cover_every_corpus_turn_shape():
    """Every corpus turn either matches a pinned template shape or is a
    known row-less shape (tool JSON, fillers, >600-char sentence,
    bracketed sentence) — no silent fall-through of a row-bearing turn."""
    from ice_ray.gold_templates import template_rows
    from ice_ray.sources.transcripts import generate_transcripts

    tr, _ = generate_transcripts(2000, seed=7)
    rowless_markers = ('{"status"', "Thanks for", "Please summarize",
                       "That sounds", "What happened", "The log contains",
                       "The file (see notes)", "The weather in")
    for text in set(tr.column("text").to_pylist()):
        prows, trows = template_rows(text)
        if not prows and not trows:
            assert text.startswith(rowless_markers), text


def test_independent_annotator_matches_nlp_chain_on_corpus():
    """The template-grammar annotator (own tokenizer, pinned POS table,
    regex mentions, per-shape dep patterns — gold_templates.py) must
    reproduce the NLP chain's annotations exactly on every distinct
    corpus text."""
    from ice_ray.gold_templates import annotate_template
    from ice_ray.oracle import _SerialAnnotator
    from ice_ray.sources.transcripts import generate_transcripts

    tr, _ = generate_transcripts(1500, seed=42)
    sa = _SerialAnnotator()
    for text in sorted(set(tr.column("text").to_pylist())):
        a, b = sa.annotate(text), annotate_template(text)
        for k in ("sentences", "tokens", "mentions", "deps"):
            assert [tuple(x) for x in a[k]] == [tuple(x) for x in b[k]], \
                (k, text)
