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
             "the and of to in is that", "¡hola! ¿qué? el la de que y"]
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
