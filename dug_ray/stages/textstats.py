"""Text analysis operators: quality scoring, token counts, language ID,
document fingerprinting.

Beyond-reference training-data ops. Quality metrics / token counts /
fingerprints are exact-deterministic with DuckDB oracles; language ID is a
real char-trigram classifier (engine-only, rows-only oracle — the synthetic
corpus shares one vocabulary across langs, so its predictions are
uninformative but the op is fully functional).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

STOPWORDS = ("the", "a")

# Gopher/C4-style quality-gate thresholds — the single engine-side source
# of truth shared by quality_filters and curated_corpus (the SQL oracles
# mirror them as literals; change both together)
QUALITY_N_TOK = (8, 100000)       # token-count window
QUALITY_TOK_LEN = (3.0, 10.0)     # mean token length window
QUALITY_DISTINCT_MULT = 5         # n_types * MULT > n_tokens (ratio > 0.2)


def text_quality(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-doc quality metrics, fully vectorized with Arrow kernels:
    n_tokens (whitespace), n_types (distinct tokens), stopword counts and
    ratio, distinct_ratio, avg_token_len, n_chars. Ratios are double
    divisions of int counts — bit-exact against the SQL oracle."""

    def per_batch(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        n_tok = pc.list_value_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
        parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        flat = tokens.flatten()
        flat_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))) \
            .to_numpy(zero_copy_only=False)
        n = len(batch)
        sum_len = np.zeros(n, dtype=np.int64)
        np.add.at(sum_len, parent, flat_len)
        n_stop = np.zeros(n, dtype=np.int64)
        np.add.at(n_stop, parent, is_stop.astype(np.int64))
        # distinct tokens per doc
        df = pd.DataFrame({"p": parent, "t": flat.to_numpy(zero_copy_only=False)})
        n_types = df.drop_duplicates().groupby("p").size()
        n_types_arr = np.zeros(n, dtype=np.int64)
        n_types_arr[n_types.index.to_numpy()] = n_types.to_numpy()
        out = {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "n_tokens": pa.array(n_tok),
            "n_types": pa.array(n_types_arr),
            "n_stopwords": pa.array(n_stop),
            "stopword_ratio": pa.array(n_stop / n_tok, pa.float64()),
            "distinct_ratio": pa.array(n_types_arr / n_tok, pa.float64()),
            "avg_token_len": pa.array(sum_len / n_tok, pa.float64()),
            "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
        }
        # pass grouping columns through when the caller selected them
        # (composed pipelines like curated_corpus keep `source` alongside)
        if "source" in batch.column_names:
            out["source"] = batch["source"]
        return pa.table(out)

    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def fingerprints(docs: ray.data.Dataset, k: int = 4) -> ray.data.Dataset:
    """Document fingerprints: full-content md5 + winnowing-style min-k of
    word-3-gram shingle hashes (pipe-joined sorted hex prefixes)."""
    from dug_ray.hashing import md5_hex
    from dug_ray.stages.dedup import _shingle_df

    def per_batch(batch: pa.Table) -> pa.Table:
        df = batch.select(["doc_id", "text"]).to_pandas()
        content = md5_hex(batch["text"])
        sh = _shingle_df(batch)
        # hash each UNIQUE shingle once, then map — not per occurrence
        uniq = sh["shingle"].unique()
        sh["h"] = sh["shingle"].map(dict(zip(uniq, md5_hex(uniq.astype(str), 16))))
        mink = (sh.sort_values("h").groupby("doc_id")["h"]
                .agg(lambda s: "|".join(s.head(k))))
        return pa.table({
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "content_hash": pa.array(content, pa.string()),
            "min_shingles": pa.array(df["doc_id"].map(mink).fillna(""), pa.string()),
        })

    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


# char-trigram profiles for a real (if tiny) language-ID heuristic
_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "ent"],
    "fr": ["les", "ent", "de ", "ion", "que"],
    "es": ["de ", "la ", "os ", "ión", "que"],
    "de": ["der", "ein", "ich", "sch", "und"],
    "zh": ["de ", "shi", "zho", "ng ", "ian"],
}


class LangId:
    """Actor-pool language identifier: char-trigram profile scoring.

    State (compiled profile tables) built once per actor (__init__)."""

    def __init__(self):
        self.profiles = {lang: set(tris) for lang, tris in _LANG_PROFILES.items()}
        self.langs = sorted(self.profiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds, scores = [], []
        for t in texts:
            tris = {t[i:i + 3] for i in range(len(t) - 2)}
            best_lang, best = self.langs[0], -1.0
            for lang in self.langs:
                s = len(tris & self.profiles[lang])
                if s > best:
                    best_lang, best = lang, s
            preds.append(best_lang)
            scores.append(float(best))
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "pred_lang": pa.array(preds, pa.string()),
            "lang_score": pa.array(scores, pa.float64()),
        })


def langid(docs: ray.data.Dataset, concurrency: int | tuple = (1, 4)) -> ray.data.Dataset:
    return docs.map_batches(LangId, batch_format="pyarrow", batch_size=None,
                            concurrency=concurrency)


def unigram_logprob(docs: ray.data.Dataset,
                    num_buckets: int = 16) -> ray.data.Dataset:
    """Unigram language-model score per document — the classic LM-based
    quality filter: logprob(doc) = sum over token occurrences of
    ln(count(token) / corpus_total).

    Exactness channel: ln is evaluated ONCE per distinct vocabulary term
    (math.log = libm, the same code path DuckDB's ln takes — np.log's SIMD
    implementation can differ in the last ulp), quantized
    floor(ln(p) * 1e6) to int64, and the per-doc reduction is then an
    exact integer sum — bit-identical to the SQL oracle regardless of
    summation order.

    Scale shape: pass 1 is the usual count combiner (per-batch Arrow
    group-count, bucketed merge); the vocabulary table here is broadcast
    back as a dict (bounded: the synthetic corpus vocabulary; ln is
    O(vocab)). At web scale the broadcast swaps for a hash join of the
    token stream against the vocab table — same two-exchange shape as
    tfidf_topk's document-frequency join."""
    import math

    from dug_ray.shuffle import bucketed_group_apply, typed_table

    def count_batch(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        g = (pa.table({"term": tokens.flatten()})
             .group_by("term").aggregate([([], "count_all")])
             .rename_columns(["term", "n"]))
        return g.set_column(1, "n", pc.cast(g["n"], pa.int64()))

    partial = docs.map_batches(count_batch, batch_format="pyarrow",
                               batch_size=None)
    vocab = bucketed_group_apply(
        partial, "term",
        lambda df: df.groupby("term", as_index=False).agg(n=("n", "sum")),
        num_buckets).to_pandas()
    total = int(vocab["n"].sum())
    lp = {t: int(math.floor(math.log(int(n) / total) * 1e6))
          for t, n in zip(vocab["term"], vocab["n"])}

    def score_batch(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        # O(unique-per-batch) lookups: dictionary-encode the flat token
        # stream, map only the dictionary, gather by code
        enc = tokens.flatten().dictionary_encode()
        dict_lp = np.array([lp[t] for t in enc.dictionary.to_pylist()],
                           dtype=np.int64)
        per_tok = dict_lp[enc.indices.to_numpy(zero_copy_only=False)]
        parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        n_docs = len(batch)
        acc = np.zeros(n_docs, dtype=np.int64)
        np.add.at(acc, parent, per_tok)  # exact int64 scatter-add
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "n_tokens": pa.array(np.bincount(parent, minlength=n_docs)
                                 .astype(np.int64), pa.int64()),
            "logprob_milli": pa.array(acc, pa.int64()),
        })

    return docs.map_batches(score_batch, batch_format="pyarrow",
                            batch_size=None)
