"""Regex scrubbing, bigram collocations and token-budget sequence packing.

Beyond-reference training-data ops (round 5):

* ``regex_scrub`` — PII-style redaction: count + replace email / URL /
  long-digit-run / lexical patterns with typed placeholder tokens. Both
  engines run the SAME RE2 patterns (pyarrow's ``count_substring_regex`` /
  ``replace_substring_regex`` and DuckDB's ``regexp_extract_all`` /
  ``regexp_replace`` are both RE2), so the redacted text is bit-exact.
  The synthetic corpus contains no emails/URLs/digit runs — the email/
  URL/NUM patterns exercise the machinery and pin zero counts; the
  lexical stopword pattern actually fires on every document.

* ``bigram_counts`` — corpus-wide adjacent-token collocations, fully
  vectorized: the token ListArray is flattened ONCE, neighbours are
  zero-copy slices of the flat values buffer joined at C speed
  (``binary_join_element_wise``), and document boundaries are masked with
  one numpy comparison over ``list_parent_indices``. Per-batch combiner →
  bucketed merge → per-bucket top-k → one tiny global sort. No Python
  token loop anywhere.

* ``pack_sequences`` — greedy contiguous token-budget packing (the
  "sequence packing" step of an LLM data pipeline): documents in doc_id
  order are assigned to bins of ``budget`` tokens by their EXCLUSIVE
  global running token count (a document straddling a boundary belongs to
  the bin where it starts). The global prefix sum is computed with the
  classic two-pass distributed scan: (1) per-range partial sums (tiny),
  prefix-summed once on the driver, (2) a bucketed second pass adds the
  broadcast range offset to the in-range cumulative sum. No stage ever
  holds more than one doc_id range.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dug_ray.shuffle import bucketed_group_apply, typed_table

# RE2 patterns shared verbatim with the SQL oracles (queries.py renders
# them into regexp_extract_all / regexp_replace literals — change both
# together). Order matters: replacements are applied in this sequence and
# no placeholder token re-matches a later pattern.
SCRUB_PATTERNS = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", "https?://[^ ]+", "<URL>"),
    ("num", "[0-9]{7,}", "<NUM>"),
    ("stop", "\\b(the|a|dup)\\b", "<STOP>"),
)


def regex_scrub(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_email, n_url, n_num, n_stop, clean_text, clean_len).

    Counts are measured on the ORIGINAL text (all four patterns), then the
    replacements are applied in SCRUB_PATTERNS order. One streaming pass,
    no shuffle."""

    def per_batch(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        out = {"doc_id": pc.cast(batch["doc_id"], pa.int64())}
        for name, pat, _repl in SCRUB_PATTERNS:
            out[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(text, pattern=pat), pa.int64())
        clean = text
        for _name, pat, repl in SCRUB_PATTERNS:
            clean = pc.replace_substring_regex(clean, pattern=pat,
                                               replacement=repl)
        out["clean_text"] = clean
        out["clean_len"] = pc.cast(pc.utf8_length(clean), pa.int64())
        return pa.table(out)

    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def bigram_counts(docs: ray.data.Dataset, k: int = 100,
                  num_buckets: int = 16) -> ray.data.Dataset:
    """Global top-``k`` adjacent-token bigrams by (count DESC, bigram ASC).

    Per-bucket top-``k`` partials bound the final exchange to
    ``k * num_buckets`` rows (a global top-k member is top-k inside its
    bucket by definition), so the last sort's input is constant-size
    regardless of corpus size."""

    def per_batch(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        vals = tokens.flatten()
        n = len(vals)
        if n < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        joined = pc.binary_join_element_wise(
            vals.slice(0, n - 1), vals.slice(1, n - 1), " ")
        same_doc = pa.array(parent[:-1] == parent[1:])
        bigrams = joined.filter(same_doc)
        g = (pa.table({"bigram": bigrams})
             .group_by("bigram").aggregate([([], "count_all")])
             .rename_columns(["bigram", "n"]))
        return g.set_column(1, "n", pc.cast(g["n"], pa.int64()))

    partial = docs.map_batches(per_batch, batch_format="pyarrow",
                               batch_size=None)

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bigram", as_index=False).agg(n=("n", "sum"))
        g = g.sort_values(["n", "bigram"], ascending=[False, True],
                          kind="mergesort").head(k)
        return g

    per_bucket = bucketed_group_apply(partial, "bigram", merge_topk,
                                      num_buckets)
    per_bucket = per_bucket.map_batches(
        lambda t: typed_table(t.to_pandas(), bigram=pa.string(),
                              n=pa.int64()),
        batch_format="pyarrow", batch_size=None)
    # final: tiny (<= k * num_buckets rows) in-dataset sort + limit
    return per_bucket.sort(["n", "bigram"], descending=[True, False]).limit(k)


def _token_counts(docs: ray.data.Dataset, span: int) -> ray.data.Dataset:
    """(doc_id, rng, tok) — whitespace token count per doc plus its doc_id
    range bucket (``doc_id // span``)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        did = pc.cast(batch["doc_id"], pa.int64())
        tok = pc.cast(pc.list_value_length(
            pc.split_pattern(batch["text"], " ")), pa.int64())
        rng = pc.cast(pc.divide(did, span), pa.int64())
        return pa.table({"doc_id": did, "rng": rng, "tok": tok})

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            batch_size=None)


def pack_sequences(docs: ray.data.Dataset, budget: int = 256,
                   span: int = 128,
                   num_buckets: int = 16) -> ray.data.Dataset:
    """(bin, n_docs, tok_total, doc_lo, doc_hi) — contiguous token-budget
    packing bins over doc_id order.

    Pass 1 reduces each doc_id range of ``span`` docs to one partial token
    sum (a combiner inside map_batches, then a tiny driver collapse — the
    driver holds n_docs/span rows, so at corpus scale ``span`` is sized to
    keep that in the thousands, e.g. span = n/4096; the per-range offsets
    it broadcasts back are the same size). Pass 2 re-reads the counts,
    sorts WITHIN each range (bounded by ``span``), adds the broadcast
    exclusive offset, and emits per-bin partials; a bin straddling a range
    boundary is merged exactly by the final bucketed sum/min/max."""
    counts = _token_counts(docs, span).materialize()

    def range_partials(batch: pa.Table) -> pa.Table:
        g = (batch.group_by("rng").aggregate([("tok", "sum")])
             .rename_columns(["rng", "tok_sum"]))
        return g

    partial = counts.map_batches(range_partials, batch_format="pyarrow",
                                 batch_size=None)
    # tiny driver collapse: n_ranges rows (documented bound above)
    sums = (partial.to_pandas().groupby("rng", as_index=False)
            .agg(tok_sum=("tok_sum", "sum")).sort_values("rng"))
    sums["offset"] = sums["tok_sum"].cumsum() - sums["tok_sum"]
    offsets = dict(zip(sums["rng"].astype(np.int64),
                       sums["offset"].astype(np.int64)))

    def per_range(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rng, g in df.groupby("rng", sort=False):
            g = g.sort_values("doc_id", kind="mergesort")
            tok = g["tok"].to_numpy(dtype=np.int64)
            cum_before = (np.cumsum(tok) - tok) + np.int64(offsets[int(rng)])
            bins = cum_before // budget
            part = pd.DataFrame({"bin": bins, "tok": tok,
                                 "doc_id": g["doc_id"].to_numpy()})
            agg = part.groupby("bin", as_index=False).agg(
                n_docs=("doc_id", "size"), tok_total=("tok", "sum"),
                doc_lo=("doc_id", "min"), doc_hi=("doc_id", "max"))
            rows.append(agg)
        return pd.concat(rows, ignore_index=True)

    per_bin_partial = bucketed_group_apply(counts, "rng", per_range,
                                           num_buckets)

    def merge_bins(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bin", as_index=False).agg(
            n_docs=("n_docs", "sum"), tok_total=("tok_total", "sum"),
            doc_lo=("doc_lo", "min"), doc_hi=("doc_hi", "max"))

    out = bucketed_group_apply(per_bin_partial, "bin", merge_bins,
                               num_buckets)
    return out.map_batches(
        lambda t: typed_table(t.to_pandas(), bin=pa.int64(),
                              n_docs=pa.int64(), tok_total=pa.int64(),
                              doc_lo=pa.int64(), doc_hi=pa.int64()),
        batch_format="pyarrow", batch_size=None)
