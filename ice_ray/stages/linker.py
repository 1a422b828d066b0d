"""Entity linking + canonicalization.

Two layers, per SURVEY.md §7 Phase 5 / the north rule:

1. **Conversation-scoped linking** (the "expanding entity dictionary"
   analog, A2/A3): inside one conversation, a bare-surname PERSON surface
   resolves to the unique full name with that surname seen in the same
   conversation.  Implemented as ``groupby("conv_id").map_groups`` —
   the shuffle key is the conversation, groups are small (turns/conv),
   and the reduce is embarrassingly parallel.

2. **Global canonicalization**: normalized-surface groupby that picks one
   canonical form per key (most frequent, ties → lexicographically
   smallest) and rewrites edges through the broadcast map (D6/D2 analog;
   reference counterpart: DepPathMap repr dedup, DepPathMap.java:196-234).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.lookup import HashedStringMap
from ..nlp.lexicon import ALL_ANAPHORA, ANAPHOR_TYPES, ANAPHORA_BY_TYPE

# anaphor surfaces (lowercase) per resolvable type: pronouns + nominal
# PERSON anaphora ("the director") in the PERSON stream, nominal ORG
# anaphora ("the company") in the ORGANIZATION stream
_ANA_ARRS = {t: pa.array(sorted(s)) for t, s in ANAPHORA_BY_TYPE.items()}
_ALL_ANA_ARR = pa.array(sorted(ALL_ANAPHORA))
_ANA_TYPE_ARR = pa.array(list(ANAPHOR_TYPES))


def _link_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Link every conversation inside one hash bucket — fully vectorized:
    build a (conv_id, surname) → unique-full-name registry with pandas
    groupbys, resolve bare surnames with a merge.  (Pronoun coreference
    is a separate bucketed pass, ``resolve_pronoun_edges``.)"""
    pairs = (("subj", "subj_type"), ("obj", "obj_type"))
    regs = []
    for col, tcol in pairs:
        # exclude anaphor surfaces ("the director" is PERSON-typed with a
        # space) — they are resolved by the coref pass, never registry rows
        m = df.loc[(df[tcol] == "PERSON") & df[col].str.contains(" ")
                   & ~df[col].str.lower().isin(ALL_ANAPHORA),
                   ["conv_id", col]].rename(columns={col: "full"})
        regs.append(m)
    reg = pd.concat(regs, ignore_index=True).drop_duplicates()
    if not reg.empty:
        reg["surname"] = reg["full"].str.rsplit(" ", n=1).str[-1]
        g = (reg.groupby(["conv_id", "surname"])["full"]
             .agg(["nunique", "first"]).reset_index())
        g = g[g["nunique"] == 1].rename(columns={"first": "full"})[
            ["conv_id", "surname", "full"]]
        df = df.copy()
        for col, tcol in pairs:
            bare = (df[tcol] == "PERSON") & ~df[col].str.contains(" ")
            if not bare.any():
                continue
            sub = df.loc[bare, ["conv_id", col]].rename(columns={col: "surname"})
            resolved = sub.merge(g, on=["conv_id", "surname"], how="left")["full"]
            vals = np.where(resolved.notna().to_numpy(),
                            resolved.to_numpy(), df.loc[bare, col].to_numpy())
            df.loc[bare, col] = vals

    return df


_KEY_SHIFT = np.int64(1) << 33  # mention keys are 2·turn_idx+flag < 2^33


class MentionIndex:
    """Array-backed antecedent index over (conv_id, _key, _name) mention
    rows.

    Layout: rows sorted by (conv_code, key) with one row per (conv, key)
    (ties keep the lexicographically largest name); ``gkeys`` is the
    composite ``conv_code·2^33 + key`` so a SINGLE vectorized
    ``searchsorted`` resolves a whole batch of pronoun rows at once —
    rightmost mention with key ≤ 2·turn−1 inside the same conversation.
    Names are dictionary-encoded (int32 codes + a small pool), so the
    broadcast pickle is a handful of flat numpy arrays + one
    conv→code dict, not 10^5 tiny per-conversation objects."""

    __slots__ = ("gkeys", "starts", "codes", "pool", "rank")

    def __init__(self):
        self.gkeys = np.empty(0, np.int64)
        self.starts = np.empty(0, np.int64)
        self.codes = np.empty(0, np.int64)
        self.pool = np.empty(0, object)
        self.rank: dict = {}

    def __len__(self) -> int:
        return len(self.gkeys)

    @classmethod
    def from_rows(cls, m: pd.DataFrame | None,
                  conv_set: set | None = None) -> "MentionIndex":
        """(conv_id, _etype, _key, _name) frame → index (a missing
        ``_etype`` column defaults to PERSON).  The index key is the
        (conversation, entity-type) STREAM — ``conv\\x01etype`` — so one
        index serves pronoun (PERSON) and nominal (ORGANIZATION, …)
        anaphora.  Fully vectorized: factorize + lexsort + boundary
        masks, no per-conversation loop.

        ``conv_set`` restricts the index to those conversations (raw
        conv ids); the filter runs on the factorized UNIQUES (one
        membership test per stream), not per row — a row-level
        ``Series.isin`` with a 10^5-string set over 10^7 mention rows
        was ~2s of serial driver time for the same result."""
        self = cls()
        if m is None or not len(m):
            return self
        etype = (m["_etype"] if "_etype" in m.columns
                 else pd.Series("PERSON", index=m.index))
        stream = (m["conv_id"] + "\x01" + etype).rename("conv_id")
        conv_codes, conv_uniq = pd.factorize(stream)
        if conv_set is not None:
            umask = (pd.Index(conv_uniq).str.split("\x01").str[0]
                     .isin(conv_set))
            if not umask.all():
                keep = umask[conv_codes]
                m, stream = m[keep], stream[keep]
                if not len(m):
                    return self
                conv_codes, conv_uniq = pd.factorize(stream)
        # sort=True → code order == lexicographic name order, so "keep
        # the largest code per (conv, key)" preserves the historical
        # largest-name tie-break
        name_codes, name_uniq = pd.factorize(m["_name"], sort=True)
        keys = m["_key"].to_numpy(np.int64)
        order = np.lexsort((name_codes, keys, conv_codes))
        c, k, nc = conv_codes[order], keys[order], name_codes[order]
        last = np.concatenate([(c[1:] != c[:-1]) | (k[1:] != k[:-1]), [True]])
        c, k, nc = c[last], k[last], nc[last]
        self.gkeys = c.astype(np.int64) * _KEY_SHIFT + k
        change = np.flatnonzero(c[1:] != c[:-1]) + 1
        # every factorized code survives the dedup, so starts[code] is
        # that conversation's slice start
        self.starts = np.concatenate([[0], change]).astype(np.int64)
        self.codes = nc.astype(np.int64)
        self.pool = np.asarray(name_uniq, dtype=object)
        self.rank = {cv: i for i, cv in enumerate(conv_uniq)}
        return self

    @classmethod
    def from_arrow(cls, t: pa.Table | None,
                   conv_set: set | None = None) -> "MentionIndex":
        """Arrow-native build: dictionary-encode both string columns in
        C++ and lexsort the integer codes — no pandas object-array
        factorize over the mention rows (that was most of the build
        time at 10^7 rows).  Semantically identical to ``from_rows``
        (incl. the ``conv\\x01etype`` stream key; missing ``_etype``
        defaults to PERSON): UTF-8 byte order equals Python code-point
        order, so the sorted-dictionary name ranks reproduce
        ``factorize(sort=True)``."""
        import pyarrow.compute as pc

        self = cls()
        if t is None or t.num_rows == 0:
            return self
        conv_raw = t.column("conv_id").combine_chunks()
        if "_etype" in t.column_names:
            stream = pc.binary_join_element_wise(
                conv_raw, t.column("_etype").combine_chunks(), "\x01")
        else:
            stream = pc.binary_join_element_wise(
                conv_raw, pa.array(["PERSON"] * len(conv_raw)), "\x01")
        conv_enc = pc.dictionary_encode(stream)
        conv_codes = conv_enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        conv_uniq = conv_enc.dictionary.to_pylist()
        keys = t.column("_key").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        name_enc = pc.dictionary_encode(t.column("_name").combine_chunks())
        name_codes = name_enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        if conv_set is not None:
            umask = np.fromiter(
                (c.split("\x01", 1)[0] in conv_set for c in conv_uniq),
                bool, len(conv_uniq))
            if not umask.all():
                keep = umask[conv_codes]
                if not keep.any():
                    return self
                remap = np.cumsum(umask) - 1
                conv_codes = remap[conv_codes[keep]]
                keys, name_codes = keys[keep], name_codes[keep]
                conv_uniq = [c for c, m in zip(conv_uniq, umask) if m]
        # rank names by lexicographic order of the dictionary
        order = pc.sort_indices(name_enc.dictionary).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rank_of = np.empty(len(order), np.int64)
        rank_of[order] = np.arange(len(order))
        nc = rank_of[name_codes]
        sort_idx = np.lexsort((nc, keys, conv_codes))
        c, k, nc = conv_codes[sort_idx], keys[sort_idx], nc[sort_idx]
        last = np.concatenate([(c[1:] != c[:-1]) | (k[1:] != k[:-1]), [True]])
        c, k, nc = c[last], k[last], nc[last]
        self.gkeys = c * _KEY_SHIFT + k
        change = np.flatnonzero(c[1:] != c[:-1]) + 1
        self.starts = np.concatenate([[0], change]).astype(np.int64)
        self.codes = nc
        self.pool = np.asarray(
            name_enc.dictionary.take(pa.array(order)).to_pylist(),
            dtype=object)
        self.rank = {cv: i for i, cv in enumerate(conv_uniq)}
        return self

    def resolve(self, convs: np.ndarray, turns: np.ndarray) -> np.ndarray:
        """Vectorized antecedent lookup → object array of names (None
        where the stream is unknown or no mention precedes).  ``convs``
        holds ``conv\\x01etype`` stream keys (as built by
        from_rows/from_arrow)."""
        n = len(convs)
        out = np.full(n, None, dtype=object)
        if not len(self.gkeys) or n == 0:
            return out
        rank = self.rank
        r = np.fromiter((rank.get(c, -1) for c in convs), np.int64, n)
        target = r * _KEY_SHIFT + 2 * np.asarray(turns, np.int64) - 1
        pos = np.searchsorted(self.gkeys, target, side="right") - 1
        vidx = np.flatnonzero((r >= 0) & (pos >= 0))
        if vidx.size:
            vidx = vidx[pos[vidx] >= self.starts[r[vidx]]]
            out[vidx] = self.pool[self.codes[pos[vidx]]]
        return out


def _resolve_pron_df(df: pd.DataFrame, index: MentionIndex) -> np.ndarray:
    """Resolve anaphoric arguments (pronouns + definite nominals) of an
    edge frame in place via the index; returns the keep mask (False =
    unresolvable anaphor edge).  The antecedent stream is the argument's
    own entity type: a PERSON pronoun/nominal probes the conversation's
    PERSON mentions, "the company" (ORGANIZATION) its ORGANIZATION
    mentions.  Vectorized: one ``MentionIndex.resolve`` call per argument
    column."""
    keep = np.ones(len(df), dtype=bool)
    if not len(df):
        return keep
    convs = df["conv_id"].to_numpy()
    turns = df["turn_idx"].to_numpy()
    for col, tcol in (("subj", "subj_type"), ("obj", "obj_type")):
        vals = df[col].to_numpy().copy()
        low = pd.Series(vals).str.lower()
        types = df[tcol].to_numpy()
        is_ana = np.zeros(len(df), dtype=bool)
        for t, surfaces in ANAPHORA_BY_TYPE.items():
            is_ana |= (types == t) & low.isin(surfaces).to_numpy()
        idx = np.flatnonzero(is_ana)
        if not idx.size:
            continue
        # per-(conversation, type) antecedent stream keys
        keys = np.char.add(np.char.add(convs[idx].astype(str), "\x01"),
                           types[idx].astype(str))
        names = index.resolve(keys, turns[idx])
        ok = np.not_equal(names, None)
        keep[idx[~ok]] = False
        vals[idx[ok]] = names[ok]
        df[col] = vals
    return keep


# --- anaphora (pronoun + nominal) coreference pass -------------------------
# Conversation-scoped nearest-preceding type-compatible antecedent
# resolution — the `resolve` stage analog (src/props/parseprops:24-30;
# coref merge in aceJet/RelaxedDepPathRelationTagger.java:69-70): PERSON
# pronouns (gender-free) AND definite nominal anaphora ("the company" →
# nearest ORGANIZATION, "the director" → nearest PERSON).  Runs as its
# own bucketed exchange: slim (conv, etype, key, name) mention rows + the
# (rare) anaphor edges shuffle by hash(conv_id); each bucket resolves in
# pandas.  Nothing lands on the driver, so the pass scales with the edge
# table, and it is skipped entirely when the corpus has no anaphor edges.

def _pron_col_mask(batch: pa.Table, col: str, tcol: str):
    """True where the argument is an anaphor of its own entity type
    (PERSON pronoun/nominal, ORGANIZATION nominal)."""
    import pyarrow.compute as pc

    low = pc.utf8_lower(batch.column(col))
    m = None
    for t, arr in _ANA_ARRS.items():
        mm = pc.and_(pc.equal(batch.column(tcol), t),
                     pc.is_in(low, value_set=arr))
        m = mm if m is None else pc.or_(m, mm)
    return m


def _mention_partial(batch: pa.Table, convs) -> pa.Table:
    """Slim (conv_id, _etype, _key, _name) mention rows — one per
    PERSON/ORGANIZATION (non-anaphor) argument of every edge row,
    including the non-anaphor column of an anaphor-bearing edge ("He met
    Alice Jones" supplies Alice Jones as an antecedent for later
    anaphors).  ``convs`` (optional set) filters to anaphor-bearing
    conversations map-side."""
    import pyarrow.compute as pc

    if convs is not None:
        s = batch.column("conv_id")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        keep = pd.Series(s.to_pandas()).isin(convs).to_numpy()
        batch = batch.filter(pa.array(keep))
    parts = []
    for flag, (col, tcol) in enumerate((("subj", "subj_type"),
                                        ("obj", "obj_type"))):
        mask = pc.and_(pc.is_in(batch.column(tcol),
                                value_set=_ANA_TYPE_ARR),
                       pc.invert(_pron_col_mask(batch, col, tcol)))
        sel = batch.filter(mask)
        if sel.num_rows == 0:
            continue
        key = pc.add(pc.multiply(pc.cast(sel.column("turn_idx"),
                                         pa.int64()), 2), flag)
        parts.append(pa.table({"conv_id": sel.column("conv_id"),
                               "_etype": sel.column(tcol),
                               "_key": key,
                               "_name": sel.column(col)}))
    if not parts:
        return pa.table({"conv_id": pa.array([], pa.string()),
                         "_etype": pa.array([], pa.string()),
                         "_key": pa.array([], pa.int64()),
                         "_name": pa.array([], pa.string())})
    return pa.concat_tables(parts)


def _index_from_mentions(m: pd.DataFrame,
                         conv_set: set | None = None) -> MentionIndex:
    """(conv, _key, _name) rows → :class:`MentionIndex` (ties on the same
    (conv, _key) keep the lexicographically largest name)."""
    return MentionIndex.from_rows(m, conv_set=conv_set)


def mention_dataset(edges: "ray.data.Dataset",
                    conv_set: set | None = None) -> "ray.data.Dataset":
    """Slim (conv_id, _key, _name) mention rows as a (lazy) Dataset;
    ``conv_set`` filters map-side."""
    conv_ref = ray.put(conv_set)

    def mention_lite(batch: pa.Table) -> pa.Table:
        return _mention_partial(batch, ray.get(conv_ref))

    return edges.map_batches(mention_lite, batch_format="pyarrow")


def pull_mention_rows(edges: "ray.data.Dataset", conv_set: set | None,
                      mention_broadcast_max: int = 2_000_000):
    """ONE pass over the (materialized) raw edges → slim
    (conv_id, _key, _name) mention rows as a pandas frame
    (``conv_set=None`` skips the filter — the speculative pull that
    overlaps the link-state aggregate; the caller filters to
    pronoun-bearing conversations BEFORE building the per-conv index).
    Returns None when the pull would exceed ``mention_broadcast_max``
    rows — the caller falls back to a filtered retry or the bucketed
    mention exchange."""
    m = (mention_dataset(edges, conv_set)
         .limit(mention_broadcast_max + 1).to_pandas())
    if len(m) > mention_broadcast_max:
        return None
    return m


@ray.remote
def _mention_index_task(conv_set, *tables):
    """Worker-side :class:`MentionIndex` build — the mention blocks and
    the finished index never visit the driver (the returned ref is fed
    straight to the rewrite stage's constructor)."""
    from ..functions.blocks import ensure_arrow_block
    tables = [t for t in map(ensure_arrow_block, tables)
              if t.num_columns]                    # empty shuffle parts
    t = pa.concat_tables(tables) if tables else None
    return MentionIndex.from_arrow(t, conv_set=conv_set)


def build_mention_index(edges: "ray.data.Dataset", conv_set: set | None,
                        mention_broadcast_max: int = 2_000_000):
    """pull_mention_rows + per-conv index build; None on cap overflow."""
    m = pull_mention_rows(edges, conv_set, mention_broadcast_max)
    return None if m is None else _index_from_mentions(m)


def _resolve_broadcast(tagged, pron, conv_ref, edge_cols,
                       arrow_schema, mention_broadcast_max):
    """Broadcast fast path: mention rows of pronoun-bearing
    conversations are pulled to the driver (capped), indexed per conv,
    broadcast, and the (small) pronoun edge set resolves map-side —
    NO mention shuffle.  Returns None when the cap is exceeded (caller
    falls back to the bucketed exchange)."""
    import pyarrow.compute as pc

    def mention_lite(batch: pa.Table) -> pa.Table:
        return _mention_partial(batch, ray.get(conv_ref))

    m = (tagged.map_batches(mention_lite, batch_format="pyarrow")
         .limit(mention_broadcast_max + 1).to_pandas())
    if len(m) > mention_broadcast_max:
        return None
    mentions = _index_from_mentions(m)
    ment_ref = ray.put(mentions)

    def resolve_map(batch: pa.Table) -> pa.Table:
        idx = ray.get(ment_ref)
        df = batch.to_pandas()
        keep = _resolve_pron_df(df, idx)
        out = pa.Table.from_pandas(df[keep][edge_cols],
                                   preserve_index=False)
        cols = [pc.cast(out.column(c), arrow_schema.field(c).type)
                for c in edge_cols]
        return pa.Table.from_arrays(cols, schema=arrow_schema)

    return pron.map_batches(resolve_map, batch_format="pyarrow")


def resolve_pronoun_edges(edges: "ray.data.Dataset",
                          num_buckets: int = 64,
                          conv_filter_max: int = 2_000_000,
                          mention_broadcast_max: int = 2_000_000,
                          materialize_input: bool = True,
                          conv_set: set | None = None) -> "ray.data.Dataset":
    """Edge dataset → same dataset with pronoun arguments resolved to
    their conversation antecedent; unresolvable pronoun edges are
    dropped.  Fast path: if no edge has a pronoun argument the input is
    returned untouched (one cheap scan).

    Runs BEFORE surname-linking in the flagship pipeline: an antecedent
    recorded as a bare surname is resolved by the subsequent rewrite, so
    the fixpoint is the same, and the pass can ride an input that is
    already materialized (``materialize_input=False`` skips the internal
    materialization; the tag scan then re-executes per consumer —
    memory-speed over a materialized input).

    Shuffle-volume optimization: mention rows are emitted ONLY for
    conversations that actually contain a pronoun edge (the distinct
    pron-conv set is broadcast when it fits ``conv_filter_max``; above
    that the filter is skipped — correct either way, just more rows)."""
    import pyarrow.compute as pc

    from ..functions.shuffle import grouped_aggregate, hash_mod

    def tag(batch: pa.Table) -> pa.Table:
        m = pc.or_(_pron_col_mask(batch, "subj", "subj_type"),
                   _pron_col_mask(batch, "obj", "obj_type"))
        return batch.append_column("_pron", m)

    tagged = edges.map_batches(tag, batch_format="pyarrow")
    if materialize_input:
        tagged = tagged.materialize()
    sch = tagged.schema()
    if sch is None:  # fully empty input — nothing to resolve
        return edges
    edge_cols = [n for n in sch.names if n != "_pron"]
    arrow_schema = pa.schema(
        [(n, t) for n, t in zip(sch.names, sch.types) if n != "_pron"])
    pron = tagged.filter(expr="_pron == True").drop_columns(["_pron"])
    non_pron = tagged.filter(expr="_pron == False").drop_columns(["_pron"])
    if conv_set is None:
        # ONE driver barrier for emptiness check + pron-conv set: pron is
        # edge-fraction-small; limit() bounds the pull — if the cap is
        # hit, skip the mention filter (correct either way, just more rows)
        conv_pdf = (pron.select_columns(["conv_id"])
                    .limit(conv_filter_max + 1).to_pandas())
        if conv_pdf.empty or "conv_id" not in conv_pdf.columns:
            return non_pron  # no pronoun edges anywhere (schema-less empty)
        conv_sample = conv_pdf["conv_id"]
        conv_set = (set(conv_sample) if len(conv_sample) <= conv_filter_max
                    else None)
    elif not conv_set:
        return non_pron  # caller established there are no pronoun edges
    elif len(conv_set) > conv_filter_max:
        conv_set = None  # too large to broadcast — skip the mention filter
    conv_ref = ray.put(conv_set)

    if conv_set is not None and mention_broadcast_max > 0:
        resolved = _resolve_broadcast(tagged, pron, conv_ref,
                                      edge_cols, arrow_schema,
                                      mention_broadcast_max)
        if resolved is not None:
            return non_pron.union(resolved)

    all_cols = ["conv_id", "_etype", "_key", "_name"] + \
        [c for c in edge_cols if c != "conv_id"]

    def exchange_rows(batch: pa.Table) -> pa.Table:
        """ONE scan emits both exchange sides: slim (conv_id, _etype,
        _key, _name) mention events for anaphor-bearing conversations
        (from all edge rows, including the non-anaphor column of
        anaphor-bearing ones) AND the anaphor edge rows themselves —
        padded to the union schema (missing columns null)."""
        pron_mask = batch.column("_pron")
        body = batch.drop_columns(["_pron"])
        m = _mention_partial(body, ray.get(conv_ref))
        for c in edge_cols:
            if c != "conv_id":
                typ = body.schema.field(c).type
                m = m.append_column(c, pa.nulls(m.num_rows, typ))
        p = body.filter(pron_mask)
        p = (p.append_column("_etype", pa.nulls(p.num_rows, pa.string()))
              .append_column("_key", pa.nulls(p.num_rows, pa.int64()))
              .append_column("_name", pa.nulls(p.num_rows, pa.string())))
        return pa.concat_tables([m.select(all_cols), p.select(all_cols)])

    combined = tagged.map_batches(exchange_rows, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket", hash_mod(batch.column("conv_id"), num_buckets))

    def resolve_bucket(t: pa.Table) -> pa.Table:
        # Arrow-native: the bucket's BULK (mention rows) builds the
        # index via MentionIndex.from_arrow without a pandas
        # conversion; only the (edge-fraction-small) pronoun edge rows
        # round-trip through pandas for the in-place resolve.
        if t.num_rows == 0 or "conv_id" not in t.column_names:
            return arrow_schema.empty_table()
        is_edge = pc.and_(pc.is_null(t.column("_name")),
                          pc.is_null(t.column("_key")))
        idx = MentionIndex.from_arrow(
            t.filter(pc.invert(is_edge))
             .select(["conv_id", "_etype", "_key", "_name"]))
        e = t.filter(is_edge).select(edge_cols).to_pandas()
        if not len(e):
            return arrow_schema.empty_table()
        e = e[_resolve_pron_df(e, idx)]
        out = pa.Table.from_pandas(e, preserve_index=False)
        cols = [pc.cast(out.column(c), arrow_schema.field(c).type)
                for c in edge_cols]
        return pa.Table.from_arrays(cols, schema=arrow_schema)

    resolved = (combined.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(resolve_bucket, batch_format="pyarrow"))

    return non_pron.union(resolved)


def link_edges_by_conversation(edges: "ray.data.Dataset",
                               num_buckets: int = 64) -> "ray.data.Dataset":
    """Conversation-scoped linking via hash buckets: the shuffle key is
    ``hash(conv_id) % num_buckets`` so the reduce runs B vectorized
    pandas groups instead of one Python call per conversation (hot-conv
    skew is bounded by the bucket, not the conversation)."""
    from ..functions.shuffle import hash_mod

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket", hash_mod(batch.column("conv_id"), num_buckets))

    bucketed = edges.map_batches(add_bucket, batch_format="pyarrow")
    linked = bucketed.groupby("_bucket").map_groups(_link_bucket,
                                                   batch_format="pandas")
    return linked.drop_columns(["_bucket"])


def _norm_surface(s: str) -> str:
    return " ".join(s.lower().split())


def _norm_surface_vec(s: pd.Series) -> pd.Series:
    """Vectorized ``_norm_surface`` (C-regex whitespace collapse — must
    stay semantically identical to the scalar form)."""
    return (s.str.lower()
             .str.replace(r"\s+", " ", regex=True)
             .str.strip())


def _canon_from_counts(surf: np.ndarray, n: np.ndarray) -> dict[str, str]:
    """(surface, count) rows (surfaces may repeat) → {norm: canonical
    surface} for AMBIGUOUS norms only.  Most frequent wins, ties →
    lexicographically smallest surface.

    Norms with a single surface variant are DROPPED: the rewrite probes
    ``canon.get(norm(v), v)`` and every probe surface is in the counted
    population (S surfaces + registry-resolved bares + pronoun-resolved
    antecedents, which are themselves mention surfaces), so a
    single-variant norm always falls back to the identity — dropping it
    shrinks the broadcast map to the ambiguous tail and removes a
    Python loop over every distinct surface from the driver's critical
    path."""
    df = (pd.DataFrame({"surf": surf, "n": n})
          .groupby("surf", sort=False)["n"].sum().reset_index())
    df["norm"] = _norm_surface_vec(df["surf"])
    df = df[df["norm"].duplicated(keep=False)]
    if not len(df):
        return {}
    df = df.sort_values(["norm", "n", "surf"],
                        ascending=[True, False, True], kind="mergesort")
    top = df.drop_duplicates("norm", keep="first")
    return dict(zip(top["norm"], top["surf"]))


# --- broadcast-registry linking (fast path) -------------------------------
# Builds a {(conv_id, surname): full_name} registry via one SMALL aggregate
# (distinct registry rows, not edges) and resolves bare surnames in a plain
# map_batches — no edge shuffle.  Correct while the registry fits in worker
# memory (#conversations-bounded); at 10^12-turn scale use
# link_strategy="shuffle" (link_edges_by_conversation) instead.

def _registry_partial(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    rows: set[tuple[str, str, str]] = set()
    for col, tcol in (("subj", "subj_type"), ("obj", "obj_type")):
        mask = pc.and_(
            pc.and_(pc.equal(batch.column(tcol), "PERSON"),
                    pc.match_substring(batch.column(col), " ")),
            pc.invert(pc.is_in(pc.utf8_lower(batch.column(col)),
                               value_set=_ALL_ANA_ARR)))
        sel = batch.filter(mask)
        for c, v in zip(sel.column("conv_id").to_pylist(),
                        sel.column(col).to_pylist()):
            rows.add((c, v.rsplit(" ", 1)[1], v))
    rows = sorted(rows)
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "surname": pa.array([r[1] for r in rows], pa.string()),
        "full": pa.array([r[2] for r in rows], pa.string()),
    })


def _link_state_agg(edges: "ray.data.Dataset"):
    """The link-state aggregate: ONE pass over edges emitting four
    partial row kinds from a single map_batches —
    R: distinct (conv, surname, full) registry rows;
    S: non-bare surface counts; B: bare (conv, surname) counts;
    P: distinct conversations with an anaphor argument — pronoun or
    definite nominal (consumed by the fused coref rewrite, so no
    separate tag/filter barrier is needed) — reduced in one bucketed
    aggregate.  Anaphor surfaces are excluded from R/S/B (they are
    resolved by the coref rewrite)."""
    import pyarrow.compute as pc

    from ..functions.shuffle import grouped_aggregate

    def _rows(kind, k1, k2, n, k3=None) -> pa.Table:
        m = len(k1)

        def _col(v):
            if isinstance(v, str):
                return pa.array([v] * m, pa.string())
            return pc.cast(v, pa.string()) if not isinstance(v, list) \
                else pa.array(v, pa.string())

        return pa.table({
            "kind": pa.array([kind] * m, pa.string()),
            "k1": _col(k1),
            "k2": _col(k2),
            "k3": _col(k3 if k3 is not None else ""),
            "n": (pa.array([1] * m, pa.int64()) if n is None
                  else pc.cast(n, pa.int64())),
        })

    def partial(batch: pa.Table) -> pa.Table:
        # fully vectorized: per-column masks, value_counts/unique for the
        # distinct/count reductions, pandas str kernels only on the
        # (bounded) per-batch uniques — no per-row Python
        tables = []
        for col, tcol in (("subj", "subj_type"), ("obj", "obj_type")):
            vals = batch.column(col).combine_chunks()
            is_person = pc.equal(batch.column(tcol), "PERSON")
            # anaphor surfaces (pronouns + definite nominals) by surface
            # alone — the typed surfaces are disjoint from the name
            # vocabulary, so no type cross-check is needed here
            is_pron = pc.is_in(pc.utf8_lower(vals), value_set=_ALL_ANA_ARR)
            is_name = pc.and_(is_person, pc.invert(is_pron))
            # P rows: conversations with an anaphoric argument (any type)
            selp = batch.filter(is_pron)
            if selp.num_rows:
                pconvs = pc.unique(selp.column("conv_id").combine_chunks())
                tables.append(_rows("P", pconvs, "", None))
            has_space = pc.match_substring(vals, " ")
            full_mask = pc.and_(is_name, has_space)
            bare_mask = pc.and_(is_name, pc.invert(has_space))
            # R rows: distinct (conv, surname, full name); the surname
            # split runs on the batch uniques only, and surname/full ride
            # in separate key columns (k2/k3) so the driver finish never
            # re-splits strings
            sel = batch.filter(full_mask)
            if sel.num_rows:
                key = pc.binary_join_element_wise(
                    sel.column("conv_id"), sel.column(col), "\x01")
                uniq = pd.Series(pc.unique(key.combine_chunks()).to_pandas())
                parts = uniq.str.split("\x01", n=1, expand=True)
                full = parts[1]
                surname = full.str.rsplit(" ", n=1).str[-1]
                tables.append(_rows("R", pa.Array.from_pandas(parts[0]),
                                    pa.Array.from_pandas(surname), None,
                                    k3=pa.Array.from_pandas(full)))
            # S rows: everything that is not a bare PERSON name/pronoun
            # (empty strings — e.g. the obj slot of @MENTION pseudo-edges
            # — carry no surface and are excluded)
            skip = pc.or_(pc.or_(bare_mask, is_pron), pc.equal(vals, ""))
            vc = pc.value_counts(pc.drop_null(
                pc.if_else(skip, pa.nulls(len(vals), pa.string()),
                           vals)).combine_chunks())
            if len(vc):
                tables.append(_rows("S", vc.field("values"), "",
                                    vc.field("counts")))
            # B rows: bare surname counts per conversation
            selb = batch.filter(bare_mask)
            if selb.num_rows:
                key = pc.binary_join_element_wise(
                    selb.column("conv_id"), selb.column(col), "\x01")
                vc = pc.value_counts(key.combine_chunks())
                s = pd.Series(vc.field("values").to_pandas())
                parts = s.str.split("\x01", n=1, expand=True)
                tables.append(_rows("B", pa.Array.from_pandas(parts[0]),
                                    pa.Array.from_pandas(parts[1]),
                                    vc.field("counts")))
        if not tables:
            return pa.table({"kind": pa.array([], pa.string()),
                             "k1": pa.array([], pa.string()),
                             "k2": pa.array([], pa.string()),
                             "k3": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.concat_tables(tables)

    return grouped_aggregate(
        edges.map_batches(partial, batch_format="pyarrow"),
        keys=["kind", "k1", "k2", "k3"], specs=[("n", "sum")],
        rename={"n_sum": "n"})


def _finish_link_state(pdf: pd.DataFrame):
    """Reduced link-state rows → (registry, canon, pron_convs)."""
    if pdf.empty or "kind" not in pdf.columns:
        return HashedStringMap(), {}, set()

    # registry from R rows: exactly one full per (conv, surname); keyed
    # by "conv\x01surname" (string keys build and probe faster than
    # tuples at conversation counts).  R rows are DISTINCT
    # (conv, surname, full) by aggregate construction, so "exactly one
    # full name" == "key appears once" — a factorize + bincount, no
    # string re-split and no pandas nunique groupby (this finish runs
    # serially on the driver and was ~75% of build_link_state at 10^6+
    # registry rows).
    r = pdf[pdf["kind"] == "R"]
    registry = HashedStringMap()
    if len(r):
        key = (r["k1"] + "\x01" + r["k2"]).to_numpy()
        codes, uniq = pd.factorize(key)
        once = np.bincount(codes) == 1
        mask = once[codes]
        registry = HashedStringMap(key[mask], r["k3"].to_numpy()[mask])

    # canonical counts: S surfaces + registry-resolved B surnames —
    # fully vectorized; the finish keeps only ambiguous norms
    # (_canon_from_counts), so no per-surface Python loop survives on
    # the driver's critical path
    s = pdf[pdf["kind"] == "S"]
    parts = [pd.DataFrame({"surf": s["k1"].to_numpy(),
                           "n": s["n"].to_numpy()})]
    b = pdf[pdf["kind"] == "B"]
    if len(b):
        bkey = (b["k1"] + "\x01" + b["k2"]).to_numpy()
        resolved = registry.lookup(bkey, b["k2"].to_numpy())
        parts.append(pd.DataFrame({"surf": resolved,
                                   "n": b["n"].to_numpy()}))
    counts_df = pd.concat(parts, ignore_index=True)
    canon = _canon_from_counts(counts_df["surf"].to_numpy(),
                               counts_df["n"].to_numpy())
    pron_convs = set(pdf.loc[pdf["kind"] == "P", "k1"])
    return registry, canon, pron_convs


@ray.remote(num_returns=3)
def _finish_link_state_task(*tables):
    """Worker-side link-state finish: the reduced aggregate blocks are
    concatenated and finished on a worker, so the 10^6-row registry is
    built and stored in the object store WITHOUT ever visiting the
    driver (no to_pandas pull, no driver finish, no ray.put) — that
    finish was ~3s of serial driver time per run at every cluster
    size."""
    from ..functions.blocks import ensure_arrow_block
    tables = [t for t in map(ensure_arrow_block, tables)
              if t.num_columns]                    # empty shuffle parts
    pdf = pa.concat_tables(tables).to_pandas() if tables \
        else pd.DataFrame()
    return _finish_link_state(pdf)


def build_link_state(edges: "ray.data.Dataset"):
    """Driver-side link state: aggregate → (registry, canon,
    pron_convs) as plain objects (used by the non-speculative path and
    tests)."""
    return _finish_link_state(_link_state_agg(edges).to_pandas())


def build_link_state_refs(edges: "ray.data.Dataset"):
    """Link state as OBJECT REFS: runs the aggregate, then finishes in
    a Ray task → (registry_ref, canon_ref, pron_convs_ref).  The caller
    ray.gets only the (small) pron-conv set; registry/canon refs feed
    the rewrite stage directly."""
    refs = _link_state_agg(edges).materialize().to_arrow_refs()
    return _finish_link_state_task.remote(*refs)


class LinkCanonRewriter:
    """Fused link + canonicalize rewrite: resolve bare PERSON surnames
    via the broadcast registry, then map every surface through the
    canonical map on dictionary-encoded uniques.  (Pronoun coreference
    is the separate ``resolve_pronoun_edges`` pass.)"""

    def __init__(self, registry_ref, canon_ref):
        reg = (ray.get(registry_ref)
               if isinstance(registry_ref, ray.ObjectRef) else registry_ref)
        self.registry = (reg if isinstance(reg, HashedStringMap)
                         else HashedStringMap(reg))
        canon = (ray.get(canon_ref)
                 if isinstance(canon_ref, ray.ObjectRef) else canon_ref)
        # small (ambiguous-norm) map as a Series: its index hashtable is
        # built once and cached across batches, unlike Series.map(dict)
        self._canon = pd.Series(canon, dtype=object)

    def _link_col(self, batch: pa.Table, col: str, tcol: str) -> pa.Array:
        import pyarrow.compute as pc

        vals = batch.column(col).combine_chunks()
        bare = pc.and_(pc.equal(batch.column(tcol), "PERSON"),
                       pc.invert(pc.match_substring(vals, " ")))
        idx = np.flatnonzero(bare.combine_chunks().to_numpy(zero_copy_only=False))
        if idx.size == 0:
            return vals
        ia = pa.array(idx)
        # vectorized registry probe: Arrow string concat + flat-array map
        conv = batch.column("conv_id").combine_chunks()
        probe = pc.binary_join_element_wise(
            pc.take(conv, ia), pc.take(vals, ia),
            "\x01").to_numpy(zero_copy_only=False)
        bvals = pc.take(vals, ia).to_numpy(zero_copy_only=False)
        out = vals.to_numpy(zero_copy_only=False).copy()
        out[idx] = self.registry.lookup(probe, bvals)
        return pa.array(out, pa.string())

    def _canon_col(self, col: pa.Array) -> pa.Array:
        import pyarrow.compute as pc

        if len(self._canon) == 0:   # common case after the ambiguous-
            return col              # norm shrink — skip the encode
        enc = pc.dictionary_encode(col)
        uniq = pd.Series(enc.dictionary.to_pandas())
        mapped = _norm_surface_vec(uniq).map(self._canon).fillna(uniq)
        return pc.take(pa.array(mapped.to_numpy(), pa.string()), enc.indices)

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx_s = batch.schema.get_field_index("subj")
        idx_o = batch.schema.get_field_index("obj")
        s = self._canon_col(self._link_col(batch, "subj", "subj_type"))
        o = self._canon_col(self._link_col(batch, "obj", "obj_type"))
        return batch.set_column(idx_s, "subj", s).set_column(idx_o, "obj", o)


class FusedLinkRewriter(LinkCanonRewriter):
    """One-pass pronoun-resolve + surname-link + canonicalize rewrite.

    The round-3 headline fusion: pronoun arguments resolve map-side
    against the broadcast antecedent index (``build_mention_index``);
    unresolvable pronoun edges are dropped; the resolved batch then goes
    through the fused link + canonical rewrite.  Replaces the
    tag → filter → resolve → union → rewrite chain with a SINGLE
    consumer scan of the materialized raw edges."""

    def __init__(self, registry_ref, canon_ref, ment_ref=None):
        super().__init__(registry_ref, canon_ref)
        mentions = (ray.get(ment_ref)
                    if isinstance(ment_ref, ray.ObjectRef) else ment_ref)
        self.mentions = (mentions if isinstance(mentions, MentionIndex)
                         else MentionIndex())

    def _resolve_pron(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m_any = pc.or_(_pron_col_mask(batch, "subj", "subj_type"),
                       _pron_col_mask(batch, "obj", "obj_type"))
        if not pc.any(m_any).as_py():
            return batch
        plain = batch.filter(pc.invert(m_any))
        df = batch.filter(m_any).to_pandas()
        keep = _resolve_pron_df(df, self.mentions)
        df = df[keep]
        if not len(df):
            return plain
        res = pa.Table.from_pandas(df[batch.column_names],
                                   preserve_index=False)
        cols = [pc.cast(res.column(c), batch.schema.field(c).type)
                for c in batch.column_names]
        res = pa.Table.from_arrays(cols, schema=batch.schema)
        return pa.concat_tables([plain, res])

    def __call__(self, batch: pa.Table) -> pa.Table:
        return super().__call__(self._resolve_pron(batch))


_REWRITER_CACHE: dict = {}


def make_cached_rewriter(cls, *refs):
    """Task-based ``map_batches`` function that builds ``cls(*refs)``
    once per worker process (module-level cache keyed by the broadcast
    ObjectRefs).  Rewrite stages are cheap-init/cheap-call, so a plain
    function keeps Ray's operator fusion with the surrounding maps —
    an actor pool here pays pool startup AND breaks fusion (round-2
    perf lesson, NOTES.md)."""
    key = (cls.__name__,) + tuple(
        r.hex() if hasattr(r, "hex") else str(id(r)) for r in refs)

    def fn(batch: pa.Table) -> pa.Table:
        rw = _REWRITER_CACHE.get(key)
        if rw is None:
            if len(_REWRITER_CACHE) > 8:
                _REWRITER_CACHE.clear()
            rw = cls(*refs)
            _REWRITER_CACHE[key] = rw
        return rw(batch)
    return fn


def build_canonical_map(edges: "ray.data.Dataset") -> dict[str, str]:
    """Distinct surfaces → canonical form.  The per-surface aggregate is
    tiny (distinct entity surfaces, not edges); computed with a groupby
    over (norm_key, surface) counts and reduced on the driver."""
    import pyarrow.compute as pc

    def surface_counts(batch: pa.Table) -> pa.Table:
        tables = []
        for col in ("subj", "obj"):
            vc = pc.value_counts(batch.column(col).combine_chunks())
            tables.append(pa.table({
                "surface": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64())}))
        return pa.concat_tables(tables)

    from ..functions.shuffle import grouped_aggregate

    counts = grouped_aggregate(
        edges.map_batches(surface_counts, batch_format="pyarrow"),
        keys=["surface"], specs=[("n", "sum")], rename={"n_sum": "n"})
    pdf = counts.to_pandas()  # distinct surfaces only — small by construction
    # most frequent wins; ties → lexicographically smallest surface;
    # single-variant norms dropped (identity under the .get fallback)
    return _canon_from_counts(pdf["surface"].to_numpy(), pdf["n"].to_numpy())


class CanonicalRewriter:
    """Rewrite subj/obj through the broadcast canonical map.  The lookup
    runs on the batch's dictionary-encoded uniques (entity surfaces repeat
    heavily), not per row."""

    def __init__(self, canon_ref):
        canon = (ray.get(canon_ref)
                 if isinstance(canon_ref, ray.ObjectRef) else canon_ref)
        self._canon = pd.Series(canon, dtype=object)

    def _rewrite(self, col: pa.ChunkedArray) -> pa.Array:
        import pyarrow.compute as pc

        arr = (col.combine_chunks()
               if isinstance(col, pa.ChunkedArray) else col)
        if len(self._canon) == 0:
            return arr
        enc = pc.dictionary_encode(arr)
        uniq = pd.Series(enc.dictionary.to_pandas())
        mapped = _norm_surface_vec(uniq).map(self._canon).fillna(uniq)
        return pc.take(pa.array(mapped.to_numpy(), pa.string()), enc.indices)

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx_s = batch.schema.get_field_index("subj")
        idx_o = batch.schema.get_field_index("obj")
        return (batch.set_column(idx_s, "subj", self._rewrite(batch.column("subj")))
                     .set_column(idx_o, "obj", self._rewrite(batch.column("obj"))))
