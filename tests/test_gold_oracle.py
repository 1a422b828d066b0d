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
                 "pmi_index", "bootstrap_candidates", "soft_decode"]:
        p = os.path.join(GOLD_DIR, "synth", f"{name}.parquet")
        assert pq.read_metadata(p).num_rows > 0, name
