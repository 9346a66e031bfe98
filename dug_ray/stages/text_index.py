"""Corpus text-index operators: repetition scoring, tf-idf, posting lists.

Three index-family operators a training-data pipeline runs over the whole
corpus (beyond the per-doc stats in ``textstats.py``):

- ``dup_chunk_ratio``: MassiveText/C4-style repetition score — for each
  doc, the fraction of its 8-token chunks whose exact text occurs more
  than once in the CORPUS. The scalable shape: per-batch (doc, chunk)
  emission (chunks ride the existing spanifier), one bucketed exchange on
  the chunk text (every occurrence of a chunk lands in one bucket, so the
  global count is exact), per-bucket partial per-doc tallies, and a tiny
  final per-doc merge. Ratio is integer-exact (milli-units) — no float
  summation crosses engines.
- ``tfidf_topk``: per-doc top-3 terms by tf * ln(N/df). Term counts are
  per-batch combiners; df comes from one bucketed exchange on the term;
  the scored rank is a second, doc-keyed exchange. The score is a single
  float expression over exact ints (tf, df, N), so it is bit-identical to
  the SQL oracle (same discipline as sketch.estimate).
- ``build_postings``: the inverted-index build (term -> document
  frequency + the first-k posting list, numerically ascending,
  pipe-joined) — the serving-index artifact shape, fully string/int exact.

All three follow the engine's shuffle discipline: per-batch combiners
before every exchange, ``bucketed_group_apply`` for the wide steps, typed
Arrow outputs (schema-stable on empty partials).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dug_ray.shuffle import bucketed_group_apply, typed_table

CHUNK_TOKENS = 8  # == io.SPAN_TOKENS: chunks are the spanifier's text spans


def _doc_chunks(batch: pa.Table) -> pd.DataFrame:
    """(doc_id, chunk_text) rows for a documents batch — disjoint 8-token
    chunks, vectorized (token re-windowing via list-array offsets, chunk
    assembly via ``binary_join``; no Python loop over rows or tokens).

    Null-text docs are dropped, matching the SQL oracle (string_split of
    NULL lateral-unnests to zero rows) — a null token list would otherwise
    poison the int64 length cast (NaN -> INT64_MIN) and crash np.repeat."""
    batch = batch.filter(pc.is_valid(batch["text"]))
    tokens = pc.split_pattern(batch["text"], " ")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    n_tok = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    n_chunks = -(-n_tok // CHUNK_TOKENS)  # ceil
    flat = tokens.flatten()
    # chunk boundaries inside the flat token stream: each doc contributes
    # ceil(n/8) chunks of 8 tokens (last one short). Docs are contiguous in
    # the flat stream, so every chunk's end == the next chunk's start (a
    # doc's last chunk ends where the next doc begins) — the offsets array
    # is just all chunk starts plus the stream length.
    doc_starts = np.zeros(len(n_tok) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=doc_starts[1:])
    total = int(n_chunks.sum())
    chunk_base = np.zeros(len(n_chunks) + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=chunk_base[1:])
    within = np.arange(total) - np.repeat(chunk_base[:-1], n_chunks)
    starts = np.repeat(doc_starts[:-1], n_chunks) + CHUNK_TOKENS * within
    offsets = np.append(starts, doc_starts[-1])
    chunk_lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    chunks = pc.binary_join(chunk_lists, " ")
    doc_ids = np.repeat(
        batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), n_chunks)
    return pd.DataFrame({
        "doc_id": doc_ids,
        "pos": within,  # 0-based within-doc chunk ordinal
        "chunk": chunks.to_numpy(zero_copy_only=False),
    })


def dup_chunk_ratio(docs: ray.data.Dataset, num_buckets: int = 32) -> ray.data.Dataset:
    """Per-doc repetition score over exact 8-token chunks (see module
    docstring). Output: doc_id, n_chunks, n_dup, dup_milli
    (= n_dup * 1000 // n_chunks, integer-exact)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        df = _doc_chunks(batch)
        # combiner: one row per (doc, chunk) with its in-doc multiplicity —
        # only distinct chunk strings cross the exchange per doc
        g = df.groupby(["chunk", "doc_id"], as_index=False).agg(n=("doc_id", "size"))
        return typed_table(g, chunk=pa.string(), doc_id=pa.int64(), n=pa.int64())

    partial = docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)

    def per_chunk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # every occurrence of a chunk is in this bucket: global count is
        # the sum of in-doc multiplicities
        cnt = df.groupby("chunk")["n"].transform("sum")
        df = df.assign(dup=(cnt > 1).astype(np.int64) * df["n"])
        out = df.groupby("doc_id", as_index=False).agg(
            n_chunks=("n", "sum"), n_dup=("dup", "sum"))
        return out

    per_bucket = bucketed_group_apply(partial, "chunk", per_chunk_bucket, num_buckets)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", as_index=False).agg(
            n_chunks=("n_chunks", "sum"), n_dup=("n_dup", "sum"))
        out["dup_milli"] = out["n_dup"] * 1000 // out["n_chunks"]
        return out

    final = bucketed_group_apply(per_bucket, "doc_id", per_doc, 8)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({c: pc.cast(batch[c], pa.int64())
                         for c in ("doc_id", "n_chunks", "n_dup", "dup_milli")})

    return final.map_batches(fin, batch_format="pyarrow", batch_size=None)


def tfidf_topk(docs: ray.data.Dataset, k: int = 3,
               num_buckets: int = 16) -> ray.data.Dataset:
    """Per-doc top-``k`` terms by tf * ln(N/df), ties by term ascending.
    Output: doc_id, term, tf, df, score, rank."""
    n_docs = docs.count()  # metadata count — no pipeline execution

    def per_batch(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        parent = pc.list_parent_indices(tokens)
        ids = pc.take(pc.cast(batch["doc_id"], pa.int64()), parent)
        pairs = pa.table({"doc_id": ids, "term": tokens.flatten()})
        g = (pairs.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
             .rename_columns(["doc_id", "term", "tf"]))
        return g

    tf = docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a term are in this bucket; (doc_id, term) rows are
        # already distinct (per-batch combiner outputs one row per pair
        # per batch; batches partition docs, so pairs never repeat)
        df = df.assign(df_=df.groupby("term")["term"].transform("size"))
        return df

    with_df = bucketed_group_apply(tf, "term", attach_df, num_buckets)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        # one float expression over exact ints — bit-identical to the SQL
        # oracle, so math.log (libm, same as DuckDB ln), not np.log (own
        # SIMD impl, can differ in the last ulp). Evaluated once per
        # DISTINCT (tf, df) pair, then gathered — no per-row Python loop.
        pairs = np.stack([df["tf"].to_numpy(np.int64),
                          df["df_"].to_numpy(np.int64)], axis=1)
        u, inv = np.unique(pairs, axis=0, return_inverse=True)
        uscore = np.array([float(t) * math.log(n_docs / d) for t, d in u])
        df = df.assign(score=uscore[inv] if len(df) else np.zeros(0))
        df = df.sort_values(["doc_id", "score", "term"],
                            ascending=[True, False, True], kind="mergesort")
        df["rank"] = df.groupby("doc_id").cumcount() + 1
        df = df[df["rank"] <= k]
        return df.rename(columns={"df_": "df"})[
            ["doc_id", "term", "tf", "df", "score", "rank"]]

    final = bucketed_group_apply(with_df, "doc_id", per_doc, 8)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "term": pc.cast(batch["term"], pa.string()),
            "tf": pc.cast(batch["tf"], pa.int64()),
            "df": pc.cast(batch["df"], pa.int64()),
            "score": pc.cast(batch["score"], pa.float64()),
            "rank": pc.cast(batch["rank"], pa.int64()),
        })

    return final.map_batches(fin, batch_format="pyarrow", batch_size=None)


def build_postings(docs: ray.data.Dataset, k: int = 5,
                   num_buckets: int = 16) -> ray.data.Dataset:
    """Inverted-index build: per term, document frequency and the first-k
    posting list (doc_ids numerically ascending, pipe-joined). Only
    distinct (term, doc_id) pairs cross the exchange; the posting string
    is assembled inside the term's bucket. Output: term, df, postings."""

    def per_batch(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        parent = pc.list_parent_indices(tokens)
        ids = pc.take(pc.cast(batch["doc_id"], pa.int64()), parent)
        pairs = pd.DataFrame({
            "term": tokens.flatten().to_numpy(zero_copy_only=False),
            "doc_id": ids.to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        return typed_table(pairs, term=pa.string(), doc_id=pa.int64())

    pairs = docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)

    def per_term(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["term", "doc_id"], kind="mergesort")
        g = df.groupby("term", as_index=False).agg(
            df_=("doc_id", "size"),
            postings=("doc_id", lambda s: "|".join(map(str, s.head(k)))))
        return g.rename(columns={"df_": "df"})

    final = bucketed_group_apply(pairs, "term", per_term, num_buckets)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "term": pc.cast(batch["term"], pa.string()),
            "df": pc.cast(batch["df"], pa.int64()),
            "postings": pc.cast(batch["postings"], pa.string()),
        })

    return final.map_batches(fin, batch_format="pyarrow", batch_size=None)


def boilerplate_scrub(docs: ray.data.Dataset,
                      max_occurrences: int = 1,
                      num_buckets: int = 32) -> ray.data.Dataset:
    """CCNet/RefinedWeb-style boilerplate removal: drop every 8-token
    chunk whose exact text occurs more than ``max_occurrences`` times in
    the CORPUS, then reassemble each document from its surviving chunks
    in original order.  Output: (doc_id, clean_text, n_kept, n_removed);
    a fully-boilerplate doc survives with clean_text = ''.

    Where ``dup_chunk_ratio`` only SCORES repetition, this is the removal
    step a web-scale curation pipeline actually runs (the reference's
    pipeline has no equivalent — its inputs are curated data
    dictionaries; at 100 TB of crawled text this is the first pass).

    Two bucketed exchanges, no driver-side chunk set (the frequent-chunk
    list of a 10^12-doc corpus need not fit anywhere central):

    1. chunk-keyed: every occurrence of a chunk lands in one bucket, so
       the global count is exact; each occurrence row leaves tagged
       keep/remove — a join-with-counts fused into the counting bucket.
    2. doc-keyed: surviving chunks sort by within-doc position and
       space-join; counts ride along.
    """

    def per_batch(batch: pa.Table) -> pa.Table:
        df = _doc_chunks(batch)
        return typed_table(df, doc_id=pa.int64(), pos=pa.int64(),
                           chunk=pa.string())

    occ = docs.map_batches(per_batch, batch_format="pyarrow",
                           batch_size=None)

    def per_chunk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        total = df.groupby("chunk")["chunk"].transform("size")
        return df.assign(keep=(total <= max_occurrences).astype(np.int64))

    tagged = bucketed_group_apply(occ, "chunk", per_chunk_bucket,
                                  num_buckets)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        kept = df[df["keep"] == 1]
        text = kept.groupby("doc_id")["chunk"].agg(" ".join)
        g = df.groupby("doc_id").agg(
            n_kept=("keep", "sum"),
            n_total=("keep", "size")).reset_index()
        g["clean_text"] = g["doc_id"].map(text).fillna("")
        g["n_removed"] = g["n_total"] - g["n_kept"]
        return g[["doc_id", "clean_text", "n_kept", "n_removed"]]

    final = bucketed_group_apply(tagged, "doc_id", per_doc, num_buckets)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "clean_text": pc.cast(batch["clean_text"], pa.string()),
            "n_kept": pc.cast(batch["n_kept"], pa.int64()),
            "n_removed": pc.cast(batch["n_removed"], pa.int64()),
        })

    return final.map_batches(fin, batch_format="pyarrow", batch_size=None)


def doc_surprisal(docs: ray.data.Dataset,
                  num_buckets: int = 32) -> ray.data.Dataset:
    """Per-document unigram negative log-likelihood under the corpus's own
    unigram model — the classic cheap "perplexity" quality signal (docs
    made of globally rare tokens score high; boilerplate scores low).

    Output: ``(doc_id, n_tokens, surprisal_unats)`` where each token
    occurrence contributes ``floor(-ln(n_t / N) * 1e6)`` micro-nats
    (``n_t`` = corpus count of the term, ``N`` = corpus token total).
    Quantizing PER TERM and summing in int64 makes the result exact and
    order-independent — no float accumulation crosses engines, the same
    pinning discipline as ``dup_chunk_ratio``'s milli-ratio.  The single
    float expression ``-ln(n_t/N)`` is evaluated with ``math.log`` (libm,
    == DuckDB ``ln``) once per DISTINCT ratio.

    Scale shape: per-batch (doc, term, n) combiners; ONE term-keyed
    exchange where each bucket holds every row of its terms, so the term
    total AND the weighted per-doc partials are computed in-bucket (no
    separate term-count table is built or broadcast — at corpus scale the
    vocabulary is itself too large to ship); one doc-keyed exchange sums
    the bounded per-(bucket, doc) partials.  ``N`` is the only global: a
    scalar tree-reduce over the pair partials."""

    def pairs(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        parent = pc.list_parent_indices(tokens)
        t = pa.table({"doc_id": pc.take(batch["doc_id"], parent),
                      "term": tokens.flatten()})
        return (t.group_by(["doc_id", "term"])
                .aggregate([([], "count_all")])
                .rename_columns(["doc_id", "term", "n"]))

    dt = docs.map_batches(pairs, batch_format="pyarrow",
                          batch_size=None).materialize()
    n_total = int(dt.sum("n"))

    def per_term_bucket(df: pd.DataFrame) -> pa.Table:
        nt = df.groupby("term")["n"].transform("sum").to_numpy()
        ratio = nt.astype("float64") / float(n_total)
        # libm log per distinct ratio, gathered (PMI/tfidf discipline)
        uniq, inv = np.unique(ratio, return_inverse=True)
        logs = np.fromiter((math.log(x) for x in uniq), dtype=np.float64,
                           count=len(uniq))
        w = np.floor(-logs[inv] * 1e6).astype("int64")
        part = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "ptoks": df["n"].to_numpy(),
                             "psur": df["n"].to_numpy() * w})
        g = part.groupby("doc_id", as_index=False).agg(
            ptoks=("ptoks", "sum"), psur=("psur", "sum"))
        return typed_table(g, doc_id=pa.int64(), ptoks=pa.int64(),
                           psur=pa.int64())

    partials = bucketed_group_apply(dt, "term", per_term_bucket,
                                    num_buckets)

    def per_doc(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("doc_id", as_index=False).agg(
            n_tokens=("ptoks", "sum"), surprisal_unats=("psur", "sum"))
        return typed_table(g, doc_id=pa.int64(), n_tokens=pa.int64(),
                           surprisal_unats=pa.int64())

    return bucketed_group_apply(partials, "doc_id", per_doc, num_buckets)


def phrase_search(docs: ray.data.Dataset, first: str,
                  second: str) -> ray.data.Dataset:
    """Exact two-token phrase lookup over the corpus: documents where
    ``first`` is immediately followed by ``second`` in whitespace token
    order.  Output: ``(doc_id, n_hits, first_pos)`` (1-based position of
    the phrase's first token, matching SQL ``generate_subscripts``).

    Entirely map-side — each document's text is one row, so adjacency is
    a shifted-array compare inside the batch (flat token buffer + parent
    indices at C speed; the doc-boundary mask is ``parent[i] ==
    parent[i+1]``, the bigram_counts trick) and NO exchange happens at
    any scale.  The streaming executor prunes to (doc_id, text) at the
    read."""

    def per_batch(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        parent = pc.list_parent_indices(tokens).to_numpy(
            zero_copy_only=False).astype("int64")
        flat = tokens.flatten()
        # 1-based position within each doc: parent is nondecreasing, so
        # searchsorted(parent, parent) is each row's doc-start index
        # (robust to sliced list arrays, unlike raw .offsets)
        pos = (np.arange(len(flat), dtype="int64")
               - np.searchsorted(parent, parent) + 1)
        is1 = pc.equal(flat, first).to_numpy(zero_copy_only=False)
        is2 = pc.equal(flat, second).to_numpy(zero_copy_only=False)
        if len(flat) < 2:
            hit = np.zeros(0, dtype=bool)
        else:
            hit = is1[:-1] & is2[1:] & (parent[:-1] == parent[1:])
        idx = np.flatnonzero(hit)
        out = (pd.DataFrame({"row": parent[idx], "pos": pos[idx]})
               .groupby("row").agg(n_hits=("pos", "size"),
                                   first_pos=("pos", "min")).reset_index())
        dids = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False)
        doc_ids = dids[out["row"].to_numpy(dtype="int64")] if len(out) \
            else np.array([], dtype="int64")
        res = pd.DataFrame({"doc_id": doc_ids,
                            "n_hits": out["n_hits"].to_numpy(),
                            "first_pos": out["first_pos"].to_numpy()})
        return typed_table(res, doc_id=pa.int64(), n_hits=pa.int64(),
                           first_pos=pa.int64())

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            batch_size=None)


def bm25_topk(docs: ray.data.Dataset, query_terms: list[str], k: int = 5,
              k1: float = 1.2, b: float = 0.75,
              num_buckets: int = 8) -> ray.data.Dataset:
    """Per-query-term BM25 component ranking: for each term in
    ``query_terms``, the top-``k`` documents by

        idf(t) * (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl/avgdl))
        idf(t) = ln((N - df + 0.5) / (df + 0.5))

    Output: ``(term, doc_id, tf, dl, score, rank)``.  Components are
    ranked PER TERM (the serving shape: one candidate list per query
    term, like link.py's per-term top-k) — no cross-term float sum, so
    every float is one expression over exact ints that the SQL oracle
    mirrors token for token (libm ln, IEEE mul/div in the same order).

    Scale shape: the corpus-sized pass is ONE map_batches emitting only
    rows for the |Q| query terms (per-doc tf via is_in + value_counts)
    plus per-batch (n_docs, n_tokens) scalars; df per term and the two
    global scalars are tiny tree-reduces; ranking is a |Q|-bucket
    exchange over candidate rows only."""
    import math as _math

    probe_set = pa.array(sorted(set(query_terms)), pa.string())

    def per_batch(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        parent = pc.list_parent_indices(tokens).to_numpy(
            zero_copy_only=False)
        flat = tokens.flatten()
        dl = pc.list_value_length(tokens).to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hit = pc.is_in(flat, value_set=probe_set).to_numpy(
            zero_copy_only=False)
        hf = pd.DataFrame({
            "doc_id": ids[parent[hit]],
            "dl": dl[parent[hit]].astype("int64"),
            "term": flat.to_pandas().to_numpy(dtype=object)[hit]})
        g = hf.groupby(["term", "doc_id", "dl"], as_index=False).size() \
            .rename(columns={"size": "tf"})
        return typed_table(g, term=pa.string(), doc_id=pa.int64(),
                           dl=pa.int64(), tf=pa.int64())

    cands = docs.map_batches(per_batch, batch_format="pyarrow",
                             batch_size=None).materialize()

    # global scalars: docs and token total from metadata-cheap aggregates
    n_docs = docs.count()

    def len_partial(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        n = int(pc.sum(pc.list_value_length(tokens)).as_py() or 0)
        return pa.table({"n": pa.array([n], pa.int64())})

    n_tokens = int(docs.map_batches(len_partial, batch_format="pyarrow",
                                    batch_size=None).sum("n"))
    avgdl = float(n_tokens) / float(n_docs)

    # df per probe term: |Q| rows — tiny driver dict
    dfc = cands.groupby("term").count().to_pandas()
    df_map = dict(zip(dfc["term"], dfc["count()"].astype("int64")))

    def per_term(df: pd.DataFrame) -> pa.Table:
        # candidate rows are already distinct (doc batches partition docs)
        out = []
        for t, g in df.groupby("term", sort=False):
            dfq = int(df_map[t])
            idf = _math.log((float(n_docs - dfq) + 0.5) / (float(dfq) + 0.5))
            tf = g["tf"].to_numpy(dtype="float64")
            dln = g["dl"].to_numpy(dtype="float64")
            score = idf * (tf * (k1 + 1.0)) / \
                (tf + k1 * (1.0 - b + b * (dln / avgdl)))
            gg = g.assign(score=score).sort_values(
                ["score", "doc_id"], ascending=[False, True],
                kind="mergesort").head(k)
            gg["rank"] = np.arange(1, len(gg) + 1, dtype="int64")
            out.append(gg)
        res = pd.concat(out, ignore_index=True) if out else \
            pd.DataFrame(columns=["term", "doc_id", "tf", "dl", "score",
                                  "rank"])
        return typed_table(
            res[["term", "doc_id", "tf", "dl", "score", "rank"]],
            term=pa.string(), doc_id=pa.int64(), tf=pa.int64(),
            dl=pa.int64(), score=pa.float64(), rank=pa.int64())

    return bucketed_group_apply(cands, "term", per_term, num_buckets)
