"""Serial gold-output generation for the driver's DuckDB correctness gate.

The KG/NLP/dedup family of queries() has no natural ANSI-SQL oracle, so
each gets a GOLD PARQUET computed here and registered through
``oracle_sql()`` as ``SELECT ... FROM read_parquet('<gold>')``.  Two gold
classes:

- **template-derived** (kg_edges, soft_decode, and — since round 4 —
  path/tree counts, events_decoded, bootstrap candidates, annotations,
  ice_terms, pmi_index via gold_templates.py): computed from the corpus
  GENERATOR's template grammar or hand-pinned per-shape expectations —
  fully independent of the extraction implementation (the serial
  versions below remain as cross-checks, asserted equal in
  tests/test_gold_oracle.py);
- **independent-algorithm** (media/audio decode golds, minhash/CC/kNN
  docs-keyed golds): second implementations (brute-force cosine,
  union-find, stdlib wave + explicit DFT, bit-level simhash, …);
- **serial-reference** (retained for cross-checking): the same leaf
  kernels the Ray stages use, wired as a single-threaded loop with NO
  Ray — verifying that the distributed plumbing (actor pools, bucketed
  shuffles, first-wins aggregates, joins) reproduces the serial result.

Gold files live under ``tests/gold/`` keyed by input: ``synth/`` for the
fixed synthetic-corpus queries and ``docs<N>/`` / ``events<N>`` /
``emb<N>`` dirs keyed by input-table row count so ONE static SQL string
(with a filename LIKE filter on the count) serves every scale factor.

Regenerate with ``python -m ice_ray.oracle`` after any change to corpus
templates or operator semantics; tests/test_gold_oracle.py fails if the
committed gold drifts from live query output.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import zlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .config import MAX_BOOTSTRAPPED_ITEMS, MIN_RELATION_COUNT, TERM_STOPWORDS
from .core.annotate import annotate_text
from .core.extract import extract_paths_from_turn
from .core.trees import extract_trees_from_turn
from .nlp.lexicon import (
    CITIES,
    COUNTRIES,
    DRUGS,
    ORGS,
    PRONOUNS,
    build_entity_dict,
    lower_entity_dict,
    max_entity_phrase_len,
)
from .nlp.stemmer import stem
from .sources.transcripts import generate_transcripts

GOLD_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "tests", "gold")

# inline embedding table for the soft_decode query (stemmed keys)
SOFT_DECODE_EMB = {
    "live": [1.0, 0.1, 0.0],
    "reside": [0.95, 0.12, 0.0],
    "shun": [0.0, 0.0, 1.0],
}
SOFT_DECODE_TURNS = [
    "Fred Smith resides in Chicago.",
    "Karl Brown shuns Paris.",
]


# ---------------------------------------------------------------- helpers

class _SerialAnnotator:
    """Single-process annotate + extract with a distinct-text memo."""

    def __init__(self):
        self.d = build_entity_dict()
        self.lower = lower_entity_dict(self.d)
        self.max_len = max_entity_phrase_len(self.d)
        self._ann: dict[str, dict] = {}

    def annotate(self, text: str) -> dict:
        ann = self._ann.get(text)
        if ann is None:
            ann = annotate_text(text or "", self.d, self.max_len, self.lower)
            self._ann[text] = ann
        return ann


def _serial_path_rows(n_turns: int, emit_repr: bool = True) -> pd.DataFrame:
    """Serial extract_paths over the synthetic corpus (same leaf calls as
    stages/annotator.AnnotateExtract, no Ray)."""
    tr, _ = generate_transcripts(n_turns, seed=42)
    sa = _SerialAnnotator()
    memo: dict[str, list] = {}
    rows = []
    for cid, ti, text in zip(tr.column("conv_id").to_pylist(),
                             tr.column("turn_idx").to_pylist(),
                             tr.column("text").to_pylist()):
        text = text or ""
        prows = memo.get(text)
        if prows is None:
            ann = sa.annotate(text)
            prows = extract_paths_from_turn(
                text, ann["sentences"], ann["tokens"], ann["mentions"],
                ann["deps"], emit_repr=emit_repr)
            memo[text] = prows
        for r in prows:
            rows.append({"conv_id": cid, "turn_idx": ti, **r})
    return pd.DataFrame(rows)


def _src_key(conv: str, turn: int) -> str:
    return f"{conv}#{turn:09d}"


def _entity_type(name: str) -> str:
    if name in CITIES or name in COUNTRIES:
        return "GPE"
    if name in ORGS:
        return "ORGANIZATION"
    if name in DRUGS:
        return "DRUGS"
    return "PERSON"


# ------------------------------------------------------- synthetic corpus

def gold_kg_edges(n_turns: int = 3000) -> pd.DataFrame:
    """Template-derived gold for build_kg: dedup of the generator's gold
    triples with weight + min-src provenance + vocabulary types."""
    _, gold = generate_transcripts(n_turns, seed=42)
    g = gold.to_pandas()
    g["src"] = [_src_key(c, t) for c, t in zip(g.conv_id, g.turn_idx)]
    agg = (g.groupby(["subj", "pred", "obj"])
           .agg(weight=("src", "size"), first_src=("src", "min"))
           .reset_index())
    agg["subj_type"] = agg["subj"].map(_entity_type)
    agg["obj_type"] = agg["obj"].map(_entity_type)
    agg["conv_id"] = agg["first_src"].str.split("#").str[0]
    agg["turn_idx"] = agg["first_src"].str.split("#").str[1].astype("int32")
    agg = agg.drop(columns=["first_src"])
    return agg[["subj", "pred", "obj", "weight", "subj_type", "obj_type",
                "conv_id", "turn_idx"]].sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)


def gold_path_type_counts(n_turns: int = 3000) -> pd.DataFrame:
    df = _serial_path_rows(n_turns, emit_repr=True)
    df["payload"] = [f"{_src_key(c, t)}\x01{r}\x01{e}" for c, t, r, e in
                     zip(df.conv_id, df.turn_idx, df["repr"], df.example)]
    agg = (df.groupby("typed_path")
           .agg(count=("payload", "size"), payload=("payload", "min"))
           .reset_index())
    agg["repr"] = agg["payload"].str.split("\x01").str[1]
    agg["example"] = agg["payload"].str.split("\x01").str[2]
    return agg.drop(columns=["payload"])


def gold_path_instance_counts(n_turns: int = 1500) -> pd.DataFrame:
    df = _serial_path_rows(n_turns, emit_repr=True)
    return (df.groupby("instance_key").size().rename("count")
            .reset_index())


def tree_arg_pair(roles, values) -> str:
    by_role = dict(zip(roles, values))
    return (by_role.get("nsubj", "").lower() + ":"
            + by_role.get("dobj", "").lower())


def _serial_tree_rows(n_turns: int) -> pd.DataFrame:
    tr, _ = generate_transcripts(n_turns, seed=42)
    sa = _SerialAnnotator()
    memo: dict[str, list] = {}
    rows = []
    for cid, ti, text in zip(tr.column("conv_id").to_pylist(),
                             tr.column("turn_idx").to_pylist(),
                             tr.column("text").to_pylist()):
        text = text or ""
        trows = memo.get(text)
        if trows is None:
            ann = sa.annotate(text)
            trows = extract_trees_from_turn(
                text, ann["sentences"], ann["tokens"], ann["mentions"],
                ann["deps"])
            memo[text] = trows
        for r in trows:
            rows.append({"conv_id": cid, "turn_idx": ti,
                         "trigger": r["trigger"], "core": r["core"],
                         "repr": r["repr"],
                         "arg_pair": tree_arg_pair(r["roles"],
                                                   r["arg_values"])})
    return pd.DataFrame(rows)


def gold_tree_counts(n_turns: int = 1500) -> pd.DataFrame:
    df = _serial_tree_rows(n_turns)
    df["payload"] = [f"{_src_key(c, t)}\x01{r}" for c, t, r in
                     zip(df.conv_id, df.turn_idx, df["repr"])]
    agg = (df.groupby("core")
           .agg(count=("payload", "size"), payload=("payload", "min"))
           .reset_index())
    agg["repr"] = agg["payload"].str.split("\x01").str[1]
    return agg.drop(columns=["payload"])


def gold_events_decoded(n_turns: int = 1500) -> pd.DataFrame:
    from .pipelines.events import DEFAULT_EVENT_RULES, _core_prefix

    df = _serial_tree_rows(n_turns)
    df["event_type"] = [DEFAULT_EVENT_RULES.get(_core_prefix(c))
                        for c in df["core"]]
    df = df[df["event_type"].notna()].reset_index(drop=True)
    return df[["conv_id", "turn_idx", "trigger", "core", "repr", "event_type"]]


def _serial_annotations(n_turns: int):
    tr, _ = generate_transcripts(n_turns, seed=42)
    sa = _SerialAnnotator()
    for cid, ti, text in zip(tr.column("conv_id").to_pylist(),
                             tr.column("turn_idx").to_pylist(),
                             tr.column("text").to_pylist()):
        yield cid, ti, sa.annotate(text or "")


def ann_struct_dicts(ann: dict) -> tuple[list, list, list, list]:
    """The exact struct-dict form stages/annotator.Annotator emits (the
    fingerprint below hashes THIS form on both the serial and Ray side)."""
    sents = [{"start": s, "end": e} for s, e in ann["sentences"]]
    toks = [{"start": s, "end": e, "word": w, "pos": p}
            for s, e, w, p in ann["tokens"]]
    ments = [{"start": a, "end": b, "head_start": c, "head_end": d,
              "type": t, "mtype": m}
             for a, b, c, d, t, m in ann["mentions"]]
    deps = [{"label": l, "src_word": sw, "src_posn": sp, "src_pos": spos,
             "tgt_word": tw, "tgt_posn": tp, "tgt_pos": tpos}
            for l, sw, sp, spos, tw, tp, tpos in ann["deps"]]
    return sents, toks, ments, deps


def annotation_fingerprint(sents, toks, ments, deps) -> str:
    """Canonical md5 of the annotation struct lists (stable across block
    layouts and list/tuple representations)."""
    return hashlib.md5(json.dumps(
        {"s": sents, "t": toks, "m": ments, "d": deps},
        sort_keys=True).encode()).hexdigest()


def gold_annotations(n_turns: int = 500) -> pd.DataFrame:
    rows = []
    for cid, ti, ann in _serial_annotations(n_turns):
        sents, toks, ments, deps = ann_struct_dicts(ann)
        rows.append({"conv_id": cid, "turn_idx": ti,
                     "n_sentences": len(sents),
                     "n_tokens": len(toks),
                     "n_mentions": len(ments),
                     "n_deps": len(deps),
                     "ann_fp": annotation_fingerprint(sents, toks, ments, deps)})
    return pd.DataFrame(rows)


def gold_ice_terms(n_turns: int = 1500, anns=None) -> pd.DataFrame:
    freq: Counter = Counter()
    doc_freq: Counter = Counter()
    for _, _, ann in (anns if anns is not None
                      else _serial_annotations(n_turns)):
        local: Counter = Counter()
        toks = [{"start": s, "end": e, "word": w, "pos": p}
                for s, e, w, p in ann["tokens"]]
        ments = [{"start": a, "end": b, "type": t, "mtype": m}
                 for a, b, _, _, t, m in ann["mentions"]]
        name_spans = [(m["start"], m["end"]) for m in ments
                      if m["mtype"] == "NAM"]
        run: list[dict] = []
        for t in toks + [None]:
            if t is not None and t["pos"] in ("NN", "NNS") or \
                    (t is not None and t["pos"].startswith("JJ")):
                run.append(t)
                continue
            if run:
                in_name = any(s <= run[0]["start"] < e for s, e in name_spans)
                if not in_name:
                    words = [r["word"] for r in run]
                    for i in range(len(words) - 1, -1, -1):
                        w = words[i]
                        if len(w) <= 1 or w in TERM_STOPWORDS or w.startswith("'"):
                            break
                        local[" ".join(words[i:]) + "/nn"] += 1
                run = []
        for m in ments:
            if m["mtype"] != "NAM" or m["type"] in ("NUMBER", "MONEY", "TIME"):
                continue
            for t in toks:
                if t["start"] == m["start"]:
                    if t["word"].lower() in PRONOUNS:
                        break  # pronoun mentions are not name terms
                    term = t["word"].replace("_", " ") + "/nnp"
                    if len(term) > 5 and term[0].isalpha():
                        local[term] += 1
                    break
        freq.update(local)
        doc_freq.update(local.keys())
    return pd.DataFrame({"term": list(freq.keys()),
                         "freq": [freq[t] for t in freq],
                         "doc_freq": [doc_freq[t] for t in freq]})


def gold_pmi_index(n_turns: int = 1500, min_pmi: float = 0.1,
                   anns=None) -> pd.DataFrame:
    """Flat (term, ctx, pmi) cells (the comparable form of the PMI index)."""
    c: Counter = Counter()
    for _, _, ann in (anns if anns is not None
                      else _serial_annotations(n_turns)):
        nn_at = {t[0]: t[2] for t in ann["tokens"]
                 if t[3] in ("NN", "NNS") and len(t[2]) > 1
                 and t[2].lower() not in TERM_STOPWORDS}
        for d in ann["deps"]:
            label, sw, sp, _, tw_, tp, _ = d
            t_w = nn_at.get(tp)
            if t_w is not None and sw.lower() not in TERM_STOPWORDS:
                c[(t_w.lower(), f"{label}-1_{stem(sw.lower())}")] += 1
            s_w = nn_at.get(sp)
            if s_w is not None and tw_.lower() not in TERM_STOPWORDS:
                c[(s_w.lower(), f"{label}_{stem(tw_.lower())}")] += 1
    rs: Counter = Counter()
    cs: Counter = Counter()
    for (t, x), n in c.items():
        rs[t] += n
        cs[x] += n
    n_total = sum(rs.values())
    rows = []
    for (t, x), n in c.items():
        pmi = math.log(n / rs[t] / (cs[x] / n_total))
        if pmi > min_pmi:
            rows.append({"term": t, "ctx": x, "pmi": round(pmi, 6)})
    return pd.DataFrame(rows)


def gold_bootstrap_candidates(n_turns: int = 2000,
                              seeds=("nsubj-1:live:prep:in:pobj",),
                              min_shared: int = MIN_RELATION_COUNT,
                              df: pd.DataFrame | None = None) -> pd.DataFrame:
    if df is None:
        df = _serial_path_rows(n_turns, emit_repr=True)
    df = df.copy()
    df["arg_pair"] = (df["arg1_text"].str.lower() + ":"
                      + df["arg2_text"].str.lower())
    seed_set = set(seeds)
    seed_pairs = set(df.loc[df["path"].isin(seed_set), "arg_pair"])
    shared = df[df["arg_pair"].isin(seed_pairs)][["path", "arg_pair"]]
    per_path = (shared.drop_duplicates().groupby("path").size()
                .rename("n_shared_pairs").reset_index())
    per_path = per_path[~per_path["path"].isin(seed_set)]
    per_path = per_path[per_path["n_shared_pairs"] >= min_shared]
    per_path["score"] = per_path["n_shared_pairs"].astype(float)
    per_path = per_path.sort_values(["score", "path"],
                                    ascending=[False, True],
                                    kind="mergesort").head(MAX_BOOTSTRAPPED_ITEMS)
    return per_path.reset_index(drop=True)


def gold_event_bootstrap_candidates(
        n_turns: int = 1500,
        seeds=("discuss nsubj:OTHER dobj:OTHER",),
        min_shared: int = 1, min_score: float = 0.05,
        max_items: int = 100,
        df: pd.DataFrame | None = None) -> pd.DataFrame:
    """Serial pandas re-derivation of the event bootstrap
    (events/EventBootstrap.java:236-409): shared-arg candidate trees,
    ``s/t · s/(s+1)`` scores, 0.05 floor, cap 100, repr-dedup."""
    from .pipelines.events import _core_prefix, event_bootstrap_score

    if df is None:
        df = _serial_tree_rows(n_turns)
    df = df.copy()
    df["pcore"] = df["core"].map(_core_prefix)
    df["ptrig"] = df["pcore"].str.split(" ").str[0]
    seed_set = set(seeds)
    seed_pairs = set(df.loc[df["pcore"].isin(seed_set), "arg_pair"])
    shared = df[df["arg_pair"].isin(seed_pairs)
                & ~df["pcore"].isin(seed_set)]
    per = (shared[["pcore", "arg_pair"]].drop_duplicates()
           .groupby("pcore").size().rename("n_shared_pairs").reset_index())
    per = per[per["n_shared_pairs"] >= min_shared].copy()
    totals = (df[["ptrig", "arg_pair"]].drop_duplicates()
              .groupby("ptrig").size())
    df["payload"] = [f"{_src_key(c, t)}\x01{r}" for c, t, r in
                     zip(df.conv_id, df.turn_idx, df["repr"])]
    repr_of = (df.groupby("pcore")["payload"].min()
               .str.split("\x01").str[1].to_dict())
    per["trigger"] = per["pcore"].str.split(" ").str[0]
    per["n_total_pairs"] = per["trigger"].map(totals).fillna(0).astype(int)
    per["score"] = [round(event_bootstrap_score(int(s), int(t)), 6)
                    for s, t in zip(per["n_shared_pairs"],
                                    per["n_total_pairs"])]
    per["repr"] = per["pcore"].map(repr_of)
    per = per[per["score"] >= min_score]
    per = per.sort_values(["score", "pcore"], ascending=[False, True],
                          kind="mergesort")
    seen = {repr_of.get(s) for s in seed_set} - {None}
    keep = []
    for r in per["repr"]:
        keep.append(r not in seen)
        seen.add(r)
    per = per[np.array(keep, dtype=bool)].head(max_items)
    cols = ["pcore", "trigger", "score", "n_shared_pairs",
            "n_total_pairs", "repr"]
    return per[cols].reset_index(drop=True)


def media_fixture_rows() -> list[dict]:
    """Deterministic inline media table for the multimodal query: six
    decodable images (PPM + BMP + real PNG + real GIF + real baseline
    JPEG with 4:2:0 subsampling and restart markers + real PROGRESSIVE
    JPEG with spectral selection / successive approximation), one
    near-dup, one malformed-compressed stub."""
    from .stages.jpeg import encode_jpeg, encode_jpeg_progressive
    from .stages.multimodal import (
        encode_bmp,
        encode_gif,
        encode_png,
        encode_ppm,
    )

    def gradient(w, h, bump=0):
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0] = (x * 8) % 256
        img[:, :, 1] = (y * 10) % 256
        img[:, :, 2] = ((x + y) * 4) % 256
        if bump:
            img[:h // 2, :w // 2] = np.minimum(
                img[:h // 2, :w // 2].astype(int) + bump, 255)
        return img

    return [
        {"media_id": 1, "kind": "image", "payload": encode_ppm(gradient(40, 30)),
         "mime": "image/x-portable-pixmap", "width": 40, "height": 30,
         "duration_ms": -1},
        {"media_id": 2, "kind": "image",
         "payload": encode_bmp(gradient(40, 30, bump=40)),
         "mime": "image/bmp", "width": 40, "height": 30, "duration_ms": -1},
        {"media_id": 3, "kind": "image", "payload": b"\x89PNG not-decodable",
         "mime": "image/png", "width": 8, "height": 8, "duration_ms": -1},
        {"media_id": 4, "kind": "image",
         "payload": encode_png(gradient(32, 24, bump=12)),
         "mime": "image/png", "width": 32, "height": 24, "duration_ms": -1},
        # quantized gradient (<=256 distinct colors — GIF is paletted)
        {"media_id": 5, "kind": "image",
         "payload": encode_gif((gradient(40, 30) // 32) * 32),
         "mime": "image/gif", "width": 40, "height": 30, "duration_ms": -1},
        {"media_id": 6, "kind": "image",
         "payload": encode_jpeg(gradient(48, 32), quality=90,
                                subsampling=(2, 2), restart_interval=2),
         "mime": "image/jpeg", "width": 48, "height": 32, "duration_ms": -1},
        # progressive (SOF2) re-encode of the SAME pixels as media_id 6 —
        # must decode identically and cluster with it in cross-format dedup
        {"media_id": 7, "kind": "image",
         "payload": encode_jpeg_progressive(gradient(48, 32), quality=90,
                                            subsampling=(2, 2)),
         "mime": "image/jpeg", "width": 48, "height": 32, "duration_ms": -1},
    ]


def gold_media_features() -> pd.DataFrame:
    """Serial reference: same codec + feature kernels, no Ray; the
    comparable form fingerprints the float32 feature bytes."""
    from .stages.multimodal import (
        _fake_features,
        decode_image,
        image_features,
    )

    rows = []
    for r in media_fixture_rows():
        img = decode_image(r["payload"])
        if img is not None:
            f = image_features(img)
            decoded = True
        else:
            f = _fake_features(r["payload"])
            decoded = False
        rows.append({
            "media_id": r["media_id"],
            "decoded": decoded,
            "feat_fp": hashlib.md5(f.tobytes()).hexdigest(),
            "feat_norm": round(float(np.linalg.norm(f)), 6),
        })
    return pd.DataFrame(rows).astype({"media_id": "int64",
                                      "decoded": "bool"})


def audio_fixture_rows() -> list[dict]:
    """Deterministic inline audio table: a 440 Hz mono sine (16-bit),
    a stereo two-tone (8-bit), and a compressed-format stub."""
    from .stages.multimodal import encode_wav

    t1 = np.arange(1600) / 16000.0
    sine = 0.8 * np.sin(2 * np.pi * 440.0 * t1)
    t2 = np.arange(640) / 8000.0
    stereo = np.stack([0.5 * np.sin(2 * np.pi * 300.0 * t2),
                       0.5 * np.sin(2 * np.pi * 700.0 * t2)], axis=1)
    # 8-bit stereo fixture encoded by hand (encode_wav emits 16-bit)
    pcm8 = ((np.clip(stereo, -1, 1) * 127.0) + 128).astype(np.uint8)
    import struct as _s
    body = pcm8.reshape(-1).tobytes()
    wav8 = (b"RIFF" + _s.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + _s.pack("<IHHIIHH", 16, 1, 2, 8000,
                                8000 * 2, 2, 8)
            + b"data" + _s.pack("<I", len(body)) + body)
    return [
        {"media_id": 101, "kind": "audio", "payload": encode_wav(sine, 16000),
         "mime": "audio/wav", "width": -1, "height": -1, "duration_ms": 100},
        {"media_id": 102, "kind": "audio", "payload": wav8,
         "mime": "audio/wav", "width": -1, "height": -1, "duration_ms": 80},
        {"media_id": 103, "kind": "audio", "payload": b"ID3\x03mp3-stub",
         "mime": "audio/mpeg", "width": -1, "height": -1, "duration_ms": 500},
    ]


def media_dedup_fixture_rows() -> list[dict]:
    """Cross-format duplicate fixture: 10 distinct base images, each
    re-encoded losslessly as PPM + PNG (and GIF for every 3rd base —
    bases are pre-quantized so the palette is exact), plus a lossy
    JPEG for every 2nd base.  media_id = base*10 + format, so the
    expected duplicate groups are the id//10 families."""
    from .stages.jpeg import encode_jpeg
    from .stages.multimodal import encode_gif, encode_png, encode_ppm

    def base_img(i: int) -> np.ndarray:
        x = np.arange(40)[None, :]
        y = np.arange(30)[:, None]
        img = np.zeros((30, 40, 3), dtype=np.uint8)
        img[:, :, 0] = np.clip(x * (2 + i) + i * 17, 0, 255)
        img[:, :, 1] = np.clip(255 - y * (3 + (i % 4)), 0, 255)
        img[:, :, 2] = np.clip((x * (i % 3 + 1) + y * 2), 0, 255)
        return (img // 24) * 24          # <=256 colors → GIF-lossless

    rows = []
    for i in range(10):
        img = base_img(i)
        rows.append({"media_id": i * 10, "kind": "image",
                     "payload": encode_ppm(img),
                     "mime": "image/x-portable-pixmap",
                     "width": 40, "height": 30, "duration_ms": -1})
        rows.append({"media_id": i * 10 + 1, "kind": "image",
                     "payload": encode_png(img), "mime": "image/png",
                     "width": 40, "height": 30, "duration_ms": -1})
        if i % 2 == 0:
            rows.append({"media_id": i * 10 + 2, "kind": "image",
                         "payload": encode_jpeg(img, quality=92),
                         "mime": "image/jpeg",
                         "width": 40, "height": 30, "duration_ms": -1})
        if i % 3 == 0:
            rows.append({"media_id": i * 10 + 3, "kind": "image",
                         "payload": encode_gif(img), "mime": "image/gif",
                         "width": 40, "height": 30, "duration_ms": -1})
        if i % 5 == 0:
            # PROGRESSIVE JPEG sibling — must land in the same dup family
            from .stages.jpeg import encode_jpeg_progressive
            rows.append({"media_id": i * 10 + 4, "kind": "image",
                         "payload": encode_jpeg_progressive(img, quality=92),
                         "mime": "image/jpeg",
                         "width": 40, "height": 30, "duration_ms": -1})
    return rows


def gold_media_cross_format_dups(threshold: float = 0.995) -> pd.DataFrame:
    """INDEPENDENT pair-finding gold for the cross-format dedup query:
    decode every payload serially, then brute-force the FULL cosine
    matrix (numpy matmul over all pairs) — no LSH, no buckets.  The
    engine's LSH-bucketed candidates + per-bucket verification must
    reproduce exactly these (id1, id2, cosine) rows."""
    from .stages.multimodal import decode_image, image_features

    rows = media_dedup_fixture_rows()
    ids, feats = [], []
    for r in rows:
        img = decode_image(r["payload"])
        assert img is not None, r["media_id"]
        ids.append(r["media_id"])
        feats.append(image_features(img).astype(np.float64))
    m = np.stack(feats)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cos = (m / norms) @ (m / norms).T
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            c = round(float(cos[i, j]), 6)
            if c >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out.append((a, b, c))
    return (pd.DataFrame(out, columns=["id1", "id2", "cosine"])
            .astype({"id1": "int64", "id2": "int64", "cosine": "float64"})
            .sort_values(["id1", "id2"]).reset_index(drop=True))


def gold_audio_features() -> pd.DataFrame:
    """INDEPENDENT gold: WAVs parsed with the stdlib ``wave`` module (a
    different RIFF parser than stages/multimodal.decode_audio) and band
    energies computed from an explicit O(n²) DFT matrix (not np.fft) —
    agreement proves the engine's decode + rFFT path against a second
    implementation of the same spec.  Features are rounded to 4 decimals
    in the comparable form on both sides (the two spectral algorithms
    agree to ~1e-10; rounding removes last-ulp float noise)."""
    import io
    import wave

    from .stages.multimodal import FEATURE_DIM, _fake_features

    rows = []
    for r in audio_fixture_rows():
        try:
            with wave.open(io.BytesIO(r["payload"])) as wf:
                nch, sw, rate, nframes = (wf.getnchannels(), wf.getsampwidth(),
                                          wf.getframerate(), wf.getnframes())
                raw = wf.readframes(nframes)
            if sw == 1:
                x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128) / 128
            elif sw == 2:
                x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768
            else:
                raise ValueError("width")
            mono = x.reshape(-1, nch).mean(axis=1)
            # float32 round-trip matches the engine's decode precision
            mono = mono.astype(np.float32).astype(np.float64)
            n = len(mono)
            k = np.arange(n // 2 + 1)
            basis = np.exp(-2j * np.pi * np.outer(k, np.arange(n)) / n)
            spec = np.abs(basis @ mono) ** 2
            edges = np.linspace(0, len(spec), FEATURE_DIM + 1).astype(int)
            bands = np.array([spec[a:b].sum() if b > a else 0.0
                              for a, b in zip(edges[:-1], edges[1:])])
            e = np.log10(bands + 1e-12)
            f = (e - e.mean()).astype(np.float32)
            decoded, dur = True, int(n * 1000 / rate)
        except (wave.Error, EOFError, ValueError):
            f = _fake_features(r["payload"])
            decoded, dur = False, -1
        fr = np.round(f.astype(np.float64), 4).astype(np.float32)
        rows.append({
            "media_id": r["media_id"],
            "decoded": decoded,
            "duration_ms": dur,
            "feat_fp": hashlib.md5(fr.tobytes()).hexdigest(),
            "feat_norm": round(float(np.linalg.norm(f)), 4),
        })
    return pd.DataFrame(rows).astype({"media_id": "int64", "decoded": "bool",
                                      "duration_ms": "int64"})


def gold_soft_decode() -> pd.DataFrame:
    """Template-derived: the embedding-near verb decodes to livesIn, the
    embedding-far verb does not."""
    return pd.DataFrame([{
        "subj": "Fred Smith", "pred": "livesIn", "obj": "Chicago",
        "subj_type": "PERSON", "obj_type": "GPE",
        "conv_id": "soft-0", "turn_idx": 0,
    }]).astype({"turn_idx": "int32"})


# ---------------------------------------------------------- docs / events

def _docs_table(sf_dir: str) -> pa.Table:
    return pq.read_table(f"{sf_dir}/documents.parquet")


def gold_minhash_neardup(sf_dir: str, threshold: float = 0.5,
                         num_perm: int = 64, bands: int = 16,
                         k: int = 3) -> pd.DataFrame:
    from .stages.dedup import MAX_BUCKET, MinHasher

    docs = _docs_table(sf_dir)
    mh = MinHasher(num_perm=num_perm, bands=bands, k=k)
    ids = docs.column("doc_id").to_pylist()
    sigs = {i: mh.signature(t) for i, t in
            zip(ids, docs.column("text").to_pylist())}
    buckets: dict[tuple[int, int], list[int]] = {}
    rows_per_band = num_perm // bands
    for i in ids:
        sig = sigs[i]
        for b in range(bands):
            h = int(zlib.crc32(sig[b * rows_per_band:(b + 1) * rows_per_band]
                               .tobytes()))
            buckets.setdefault((b, h), []).append(i)
    pairs = set()
    for members in buckets.values():
        u = sorted(set(members))
        if len(u) < 2:
            continue
        if len(u) > MAX_BUCKET:
            pairs.update((u[0], j) for j in u[1:])
        else:
            pairs.update((a, b) for ai, a in enumerate(u) for b in u[ai + 1:])
    rows = []
    for a, b in sorted(pairs):
        est = round(float((sigs[a] == sigs[b]).mean()), 6)
        if est >= threshold:
            rows.append({"id1": a, "id2": b, "est_jaccard": est})
    return pd.DataFrame(rows, columns=["id1", "id2", "est_jaccard"]).astype(
        {"id1": "int64", "id2": "int64", "est_jaccard": "float64"})


def gold_neardup_clusters(sf_dir: str) -> pd.DataFrame:
    """Connected components over the gold minhash pairs via an
    INDEPENDENT union-find (the pipeline uses min-label propagation);
    cluster label = min doc_id of the component."""
    pairs = gold_minhash_neardup(sf_dir)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["id1"], pairs["id2"]):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((n, find(n)) for n in parent)
    return pd.DataFrame(rows, columns=["doc_id", "cluster"]).astype(
        {"doc_id": "int64", "cluster": "int64"})


def gold_knn_multi(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Independent numpy reference for the multi-query exact top-k:
    full cosine matrix, rank by (cosine rounded to 6 desc, vec_id)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    m = np.asarray(t["embedding"].tolist(), dtype=np.float64)
    vids = t["vec_id"].to_numpy()
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    q = mn[np.isin(vids, [0, 1, 2])]
    cos = np.round(q @ mn.T, 6)
    rows = []
    for qi in range(cos.shape[0]):
        order = np.lexsort((vids, -cos[qi]))[:k]
        for j in order:
            rows.append({"query_id": qi, "vec_id": int(vids[j]),
                         "cosine": float(cos[qi, j])})
    return pd.DataFrame(rows).astype({"query_id": "int32",
                                      "vec_id": "int64",
                                      "cosine": "float64"})


# --- independent second implementations (round-3 oracle-rigor widening)
# The four docs row-wise golds below re-derive their stats FROM THE SPEC
# with different code paths — pure-python bit arithmetic instead of
# numpy pack/unpack (simhash), character scanners instead of the regexes
# (tokenizers, the BPE-ish pre-tokenizer) — not by calling the stage
# kernels, so a buggy kernel can no longer agree with its own gold.

def _scan_runs(text: str, digits: bool) -> list[str]:
    """``[a-z]+`` (digits=False) / ``[a-z0-9]+`` (digits=True) runs of
    the lowercased text, without regex."""
    out, cur = [], []
    for ch in text.lower():
        if "a" <= ch <= "z" or (digits and "0" <= ch <= "9"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def _simhash64_bitlevel(text: str) -> int:
    """64-bit SimHash from the spec (md5-first-8-bytes little-endian
    feature hash, MSB-first bit unpacking, majority vote, MSB-first
    repacking, little-endian integer) in pure-python int ops."""
    counts = [0] * 64
    for tok in _scan_runs(text or "", digits=True):
        d = hashlib.md5(tok.encode()).digest()
        for bi in range(8):
            byte = d[bi]
            for j in range(8):
                counts[bi * 8 + j] += 1 if (byte >> (7 - j)) & 1 else -1
    val = 0
    for k in range(8):
        b = 0
        for j in range(8):
            b = (b << 1) | (1 if counts[k * 8 + j] > 0 else 0)
        val |= b << (8 * k)
    return val


_BPE_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


def _bpe_count_scan(text: str) -> int:
    """Token count of the GPT-2-style pre-tokenizer pattern
    ``'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|
    \\s+(?!\\S)|\\s+`` as a regex-free character scanner (alternation
    order and the trailing-space backtrack reproduced explicitly)."""
    def is_alpha(c):
        return "a" <= c <= "z" or "A" <= c <= "Z"

    def is_digit(c):
        return "0" <= c <= "9"

    n, i, count = len(text), 0, 0
    while i < n:
        c = text[i]
        if c == "'":
            hit = next((s for s in _BPE_CONTRACTIONS
                        if text.startswith(s, i)), None)
            if hit:
                i += len(hit)
                count += 1
                continue
        j, c2 = i, c
        if c == " " and i + 1 < n and not text[i + 1].isspace():
            j, c2 = i + 1, text[i + 1]
        if not c2.isspace():
            if is_alpha(c2):
                i = j
                while i < n and is_alpha(text[i]):
                    i += 1
            elif is_digit(c2):
                i = j
                while i < n and is_digit(text[i]):
                    i += 1
            else:
                i = j
                while i < n and not (text[i].isspace() or is_alpha(text[i])
                                     or is_digit(text[i])):
                    i += 1
            count += 1
            continue
        # whitespace run: \s+(?!\S) leaves one char for the next token's
        # optional leading space; a full run at end-of-string is one token
        k = i
        while k < n and text[k].isspace():
            k += 1
        count += 1
        i = k if (k >= n or k - i == 1) else k - 1
    return count


def _quality_spec(text: str) -> float:
    toks = _scan_runs(text or "", digits=False)
    if not toks:
        return 0.0
    stop = sum(1 for t in toks if t in TERM_STOPWORDS)
    # punctuation = codepoints outside ASCII alnum and outside the RE2
    # \s class [\t\n\f\r ] — the metric is DEFINED on the RE2/ASCII
    # classes (so a DuckDB regexp expression of it matches byte for
    # byte); e.g. 'é' and '\v' count as punctuation, per the kernel's
    # [^0-9A-Za-z\s] count_substring_regex.
    punct = sum(1 for c in text
                if not ("0" <= c <= "9" or "A" <= c <= "Z"
                        or "a" <= c <= "z" or c in "\t\n\f\r "))
    stop_ratio = stop / len(toks)
    punct_ratio = punct / max(len(text), 1)
    length_ok = 1.0 if 10 <= len(toks) <= 10000 else 0.5
    return round(length_ok * (1 - punct_ratio)
                 * (0.5 + 0.5 * min(stop_ratio * 4, 1.0)), 6)


def _lang_id_spec(text: str) -> str:
    from .stages.textstats import _LANG_PROFILES  # the profile DATA is the spec

    toks = set(_scan_runs(text or "", digits=False))
    best, best_n = "und", 0
    for lang in sorted(_LANG_PROFILES):
        hits = sum(1 for w in _LANG_PROFILES[lang] if w in toks)
        if hits > best_n:
            best, best_n = lang, hits
    return best


def gold_docs_rowwise(sf_dir: str) -> dict[str, pd.DataFrame]:
    """Row-wise doc stats from the independent spec implementations."""
    docs = _docs_table(sf_dir)
    ids = docs.column("doc_id").to_pylist()
    texts = [t or "" for t in docs.column("text").to_pylist()]
    hashes = [_simhash64_bitlevel(t) for t in texts]
    simhash = pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "simhash": pd.Series([h - (1 << 64) if h >= (1 << 63) else h
                              for h in hashes], dtype="int64"),
        "bucket": pd.Series([h >> 48 for h in hashes], dtype="int64"),
    })
    quality = pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "quality": pd.Series([_quality_spec(t) for t in texts],
                             dtype="float64"),
    })
    lang_id = pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "lang_pred": [_lang_id_spec(t) for t in texts],
    })
    bpe = pd.DataFrame({
        "doc_id": pd.Series(ids, dtype="int64"),
        "n_bpe_tokens": pd.Series([_bpe_count_scan(t) for t in texts],
                                  dtype="int64"),
    })
    return {
        "simhash": simhash,
        "quality": quality,
        "lang_id": lang_id,
        "bpe_tokens": bpe,
    }


def gold_embeddings(sf_dir: str) -> dict[str, pd.DataFrame]:
    from .stages.similarity import HyperplaneBucketer

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.column("embedding")[0].as_py())
    bucketer = HyperplaneBucketer(dim=dim)
    knn_lsh = (bucketer(emb).select(["vec_id", "label", "bucket"])
               .to_pandas())
    # embedding near-dup: exact verify inside each LSH bucket (serial),
    # over the fixture augmented with planted exact duplicates (shared
    # deterministic planting with _q_embedding_neardup — without it the
    # isotropic testdata yields 0 pairs and the oracle row is trivial)
    from .stages.similarity import plant_neardup_rows

    bdf = bucketer(plant_neardup_rows(emb)).to_pandas()
    rows = []
    for _, g in bdf.groupby("bucket", sort=True):
        m = np.asarray(g["embedding"].tolist(), dtype=np.float64)
        ids_ = g["vec_id"].to_numpy()
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        n = len(g)
        truncated = n > 256
        if truncated:
            mn, ids_ = mn[:256], ids_[:256]
            n = 256
        cos = mn @ mn.T
        for i in range(n):
            for j in range(i + 1, n):
                cv = round(float(cos[i, j]), 6)
                if cv >= 0.9:
                    a, b = sorted((int(ids_[i]), int(ids_[j])))
                    rows.append({"id1": a, "id2": b, "cosine": cv,
                                 "truncated": truncated})
    neardup = pd.DataFrame(rows, columns=["id1", "id2", "cosine", "truncated"])
    neardup = neardup.astype({"id1": "int64", "id2": "int64",
                              "cosine": "float64", "truncated": "bool"})
    return {"knn_lsh": knn_lsh, "embedding_neardup": neardup}


def gold_approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    from .functions.sketches import HyperLogLog

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    hll = HyperLogLog()
    hll.add_values(ev.column("user_id").to_pylist())
    return pd.DataFrame({"approx_distinct_users": [round(hll.estimate())]})


# ------------------------------------------------------------- write gold

def _template_gold(name: str):
    """Round-4 oracle-rigor swap: these four golds are written from the
    TEMPLATE-GRAMMAR derivation (gold_templates.py — hand-pinned expected
    rows per corpus sentence shape, no shared extraction code); the
    serial-reference versions above remain as a cross-check
    (tests/test_gold_oracle.py asserts template == serial)."""
    from . import gold_templates as gt
    return getattr(gt, f"gold_{name}_template")


SYNTH_GOLD = {
    "kg_edges": gold_kg_edges,
    "path_type_counts": _template_gold("path_type_counts"),
    "path_instance_counts": _template_gold("path_instance_counts"),
    "tree_counts": _template_gold("tree_counts"),
    "events_decoded": _template_gold("events_decoded"),
    "annotations": _template_gold("annotations"),
    "ice_terms": _template_gold("ice_terms"),
    "pmi_index": _template_gold("pmi_index"),
    "bootstrap_candidates": _template_gold("bootstrap_candidates"),
    "event_bootstrap_candidates": _template_gold("event_bootstrap_candidates"),
    "soft_decode": gold_soft_decode,
    "media_features": gold_media_features,
    "audio_features": gold_audio_features,
    "media_cross_format_dups": gold_media_cross_format_dups,
}


def docs_fingerprint(sf_dir: str) -> str:
    """8-hex content key of the documents table, identical to the SQL
    ``substr(md5(string_agg(length(text)::VARCHAR, ',' ORDER BY
    doc_id)), 1, 8)`` (row counts alone collide across scale factors)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    t = t.sort_values("doc_id")
    joined = ",".join(str(len(x)) for x in t["text"])
    return hashlib.md5(joined.encode()).hexdigest()[:8]


def emb_fingerprint(sf_dir: str) -> str:
    """8-hex content key of the embeddings table (md5 of the label
    sequence ordered by vec_id)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "label"]).to_pandas()
    t = t.sort_values("vec_id")
    joined = ",".join(str(int(x)) for x in t["label"])
    return hashlib.md5(joined.encode()).hexdigest()[:8]


def write_gold(sf_dirs: list[str], out_dir: str = GOLD_DIR) -> list[str]:
    written = []

    def _write(subdir: str, name: str, df: pd.DataFrame):
        d = os.path.join(out_dir, subdir)
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
        written.append(p)

    for name, fn in SYNTH_GOLD.items():
        _write("synth", name, fn())
    for sf_dir in sf_dirs:
        dkey = f"docs_{docs_fingerprint(sf_dir)}"
        _write(dkey, "minhash_neardup", gold_minhash_neardup(sf_dir))
        _write(dkey, "neardup_clusters", gold_neardup_clusters(sf_dir))
        for name, df in gold_docs_rowwise(sf_dir).items():
            _write(dkey, name, df)
        ekey = f"emb_{emb_fingerprint(sf_dir)}"
        _write(ekey, "knn_multi", gold_knn_multi(sf_dir))
        for name, df in gold_embeddings(sf_dir).items():
            _write(ekey, name, df)
        n_ev = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
        _write(f"events{n_ev}", "approx_distinct_users",
               gold_approx_distinct_users(sf_dir))
    return written


if __name__ == "__main__":
    import sys
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    for p in write_gold(dirs):
        print(p)
