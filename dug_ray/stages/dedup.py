"""Deduplication operators over the documents table.

Beyond-reference training-data ops (the reference has only exact set-dedup,
SURVEY.md §2.7): exact content dedup, n-gram Jaccard near-dup, MinHash+LSH,
and SimHash fingerprints. All deterministic (md5-based hashes) so each has
an exact DuckDB oracle; all shaped as per-batch combiner -> bucketed
exchange so they scale (see dug_ray.shuffle).

Scale notes per op:
- exact: hash-partition by content hash; only (hash, doc_id) pairs move.
- jaccard: the shingle->doc inverted explode is the big intermediate; at
  corpus scale you bound it by dropping ultra-common shingles (stop-shingle
  cut) before the pair join — here the 31-word vocabulary keeps it small.
- minhash-lsh: k=12 signatures, 3 bands x 4 rows; only (band, band_hash,
  doc_id) rows shuffle — O(docs x bands), independent of document length.
- simhash: one 16-bit fingerprint per doc (md5-digit hyperplanes); pairs
  within hamming <= 3 via bucketing on fingerprint minus each single bit
  (exactly covers distance<=2; distance 3 found via band trick omitted —
  documented approximation, the oracle mirrors the same candidate rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from dug_ray.hashing import md5_hex
from dug_ray.shuffle import bucketed_group_apply

SHINGLE_N = 3
MINHASH_K = 12
LSH_BANDS = 3
LSH_ROWS = 4  # MINHASH_K == LSH_BANDS * LSH_ROWS


# ---------------------------------------------------------------------------
# exact dedup (hash-partition + per-group min)
# ---------------------------------------------------------------------------

def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Group identical texts: keep min doc_id, count copies.

    Only (content_hash, doc_id) moves through the shuffle — never the text."""

    def per_batch(batch: pa.Table) -> pa.Table:
        # only doc_id crosses into pandas; the text is hashed straight off
        # the Arrow column and never copied into object-dtype strings.
        # dropna=False: md5_hex(NULL text) is None, and the default pandas
        # groupby would silently DROP those docs while the oracle's
        # GROUP BY text keeps a NULL group — null texts form one group
        # with a null content_hash (same null contract as simhash).
        df = batch.select(["doc_id"]).to_pandas()
        df["content_hash"] = md5_hex(batch["text"])
        g = df.groupby("content_hash", as_index=False, dropna=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        from dug_ray.shuffle import typed_table
        return typed_table(g, content_hash=pa.string(), doc_id=pa.int64(),
                           n_copies=pa.int64())

    partial = docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("content_hash", as_index=False, dropna=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n_copies", "sum"))

    out = bucketed_group_apply(partial, "content_hash", merge, num_buckets=32)

    def fin(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "content_hash": batch["content_hash"],
            "n_copies": pc.cast(batch["n_copies"], pa.int64()),
        })

    return out.map_batches(fin, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# word n-gram shingles (shared by jaccard + minhash)
# ---------------------------------------------------------------------------

def _shingle_df(batch: pa.Table) -> pd.DataFrame:
    """doc_id x distinct word-3-gram shingles, vectorized."""
    import pyarrow.compute as pc
    tokens = pc.split_pattern(batch["text"], " ")
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
    flat = tokens.flatten().to_numpy(zero_copy_only=False)
    # shingle i = tokens[i..i+2] within the same doc
    n = len(flat)
    if n < SHINGLE_N:
        return pd.DataFrame(columns=["doc_id", "shingle"])
    ok = parent[: n - SHINGLE_N + 1] == parent[SHINGLE_N - 1:]
    idx = np.flatnonzero(ok)
    doc_np = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sh = pd.DataFrame({
        "doc_id": doc_np[parent[idx]],
        "shingle": [" ".join(flat[i:i + SHINGLE_N]) for i in idx],
    })
    return sh.drop_duplicates()


def shingles(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, shingle, n_sh) inverted index. ``n_sh`` = the doc's distinct
    shingle count, carried on every row so downstream pair scoring never
    needs a driver-side per-doc lookup (a doc's text is one row, so the
    count is complete within the batch)."""
    def per_batch(batch: pa.Table) -> pa.Table:
        df = _shingle_df(batch)
        if df.empty:  # typed empty (object-dtype empty would arrive null-typed)
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shingle": pa.array([], pa.string()),
                             "n_sh": pa.array([], pa.int64())})
        df["n_sh"] = df.groupby("doc_id")["shingle"].transform("size")
        return pa.Table.from_pandas(df, preserve_index=False)
    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def _pairs_from_inverted(sh: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """(doc, shingle, n_sh) -> co-occurrence pairs with intersection counts
    and both docs' shingle-set sizes (``n_a``/``n_b``, ridden along from the
    index rows — no driver-side count dict).

    Bucketed by shingle: pairs are generated per bucket (a pair can appear
    in several buckets — one per shared shingle's bucket — so a final
    per-pair sum over the first doc id completes the count)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="shingle", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return (m.groupby(["doc_id_a", "doc_id_b"], as_index=False)
                .agg(inter=("shingle", "size"),
                     n_a=("n_sh_a", "first"), n_b=("n_sh_b", "first")))

    per_shingle = bucketed_group_apply(sh, "shingle", per_bucket, num_buckets)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["doc_id_a", "doc_id_b"], as_index=False).agg(
            inter=("inter", "sum"), n_a=("n_a", "first"), n_b=("n_b", "first"))

    return bucketed_group_apply(
        per_shingle, ["doc_id_a", "doc_id_b"], merge, num_buckets)


def ngram_jaccard_pairs(docs: ray.data.Dataset, min_inter: int = 2) -> ray.data.Dataset:
    """Near-dup candidate pairs sharing >= min_inter word-3-grams, with the
    exact Jaccard similarity of their shingle sets.

    Fully streamed: the per-doc shingle-set sizes ride along on the inverted
    index rows (see ``shingles``), so no materialize() of the explode and no
    O(corpus) driver-side count dict."""
    pairs = _pairs_from_inverted(shingles(docs))

    def fin(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["inter"] >= min_inter]
        jac = df["inter"] / (df["n_a"] + df["n_b"] - df["inter"])
        return pa.table({
            "doc_id_a": pa.array(df["doc_id_a"], pa.int64()),
            "doc_id_b": pa.array(df["doc_id_b"], pa.int64()),
            "inter": pa.array(df["inter"], pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        })

    return pairs.map_batches(fin, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    """One row per doc: doc_id, h0..h{k-1} minhash hex signatures.

    Hashes each UNIQUE shingle k times (a dict over the batch's distinct
    shingles), then takes per-doc minima with one vectorized string groupby
    — O(unique x k) md5 calls instead of O(doc-shingle pairs x k)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        sh = _shingle_df(batch)
        if not len(sh):  # typed empty, not a null-typed from_pandas block
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             **{f"h{i}": pa.array([], pa.string())
                                for i in range(MINHASH_K)}})
        uniq = sh["shingle"].unique()
        cols = {"doc_id": sh["doc_id"]}
        for i in range(MINHASH_K):
            hx = md5_hex(np.char.add(f"{i}:", uniq.astype(str)), 16)
            cols[f"h{i}"] = sh["shingle"].map(dict(zip(uniq, hx)))
        out = pd.DataFrame(cols).groupby("doc_id", as_index=False).min()
        out["doc_id"] = out["doc_id"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def minhash_lsh_pairs(docs: ray.data.Dataset) -> ray.data.Dataset:
    """LSH candidate pairs: docs sharing any band (band_hash = md5 of the
    band's concatenated minhashes). Output distinct (doc_id_a < doc_id_b,
    n_bands shared)."""
    sigs = minhash_signatures(docs)

    def bands(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = []
        for b in range(LSH_BANDS):
            cols = [f"h{b * LSH_ROWS + r}" for r in range(LSH_ROWS)]
            cat = df[cols[0]].str.cat([df[c] for c in cols[1:]])
            bh = md5_hex(cat.to_numpy())
            out.append(pd.DataFrame({
                "doc_id": df["doc_id"], "band": b, "band_hash": bh}))
        from dug_ray.shuffle import typed_table
        return typed_table(pd.concat(out), doc_id=pa.int64(), band=pa.int64(),
                           band_hash=pa.string())

    banded = sigs.map_batches(bands, batch_format="pyarrow", batch_size=None)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on=["band", "band_hash"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return (m.groupby(["doc_id_a", "doc_id_b"], as_index=False)
                .agg(n_bands=("band", "nunique")))

    pairs = bucketed_group_apply(banded, "band_hash", per_bucket, num_buckets=32)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["doc_id_a", "doc_id_b"], as_index=False).agg(
            n_bands=("n_bands", "sum"))

    out = bucketed_group_apply(pairs, ["doc_id_a", "doc_id_b"], merge, 32)

    def fin(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "doc_id_a": pc.cast(batch["doc_id_a"], pa.int64()),
            "doc_id_b": pc.cast(batch["doc_id_b"], pa.int64()),
            "n_bands": pc.cast(batch["n_bands"], pa.int64()),
        })

    return out.map_batches(fin, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# SimHash fingerprints
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash_fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    """16-bit simhash per doc: bit d = sign of sum over DISTINCT tokens of
    (hex_digit_d(md5(token)) - 7.5). Deterministic and SQL-mirrorable
    (DuckDB: strpos('0123456789abcdef', substr(md5(t), d+1, 1)) - 1)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # null-text docs produce no rows — matching the oracle, whose
        # LATERAL unnest(string_split(NULL)) drops the doc entirely
        batch = batch.filter(pc.is_valid(batch["text"]))
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        flat = tokens.flatten().to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"p": parent, "t": flat}).drop_duplicates()
        # digit matrix for the distinct tokens only — hex chars decoded
        # vectorized from the concatenated fixed-width digests
        uniq = df["t"].unique()
        hexes = md5_hex(uniq.astype(str), SIMHASH_BITS)
        codes = np.frombuffer("".join(hexes).encode(), np.uint8) \
            .reshape(len(uniq), SIMHASH_BITS)
        digits = np.where(codes >= 97, codes - 87, codes - 48) \
            .astype(np.float64) - 7.5
        tok_idx = pd.Series(np.arange(len(uniq)), index=uniq)
        contrib = digits[tok_idx[df["t"]].to_numpy()]
        sums = np.zeros((len(batch), SIMHASH_BITS))
        np.add.at(sums, df["p"].to_numpy(), contrib)
        bits = (sums > 0).astype(np.int64)
        fp = (bits << np.arange(SIMHASH_BITS)).sum(axis=1)
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "simhash": pa.array(fp, pa.int64()),
        })

    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 3,
                  num_buckets: int = 16) -> ray.data.Dataset:
    """Near-dup candidate pairs at hamming distance <= ``max_hamming``
    over the 16-bit simhash, WITHOUT an all-pairs comparison: the
    fingerprint splits into ``max_hamming + 1`` bands (4 x 4 bits), and
    by pigeonhole any pair within the distance budget agrees on at least
    one whole band — so candidates are generated per (band, band-value)
    bucket, verified by exact popcount, and deduped across bands in a
    pair-keyed exchange.  Output: ``(doc_a, doc_b, hamming)``.

    Scale shape: the exchange carries docs x bands band rows plus the
    (verified) candidate pairs — never the n^2 cross product; a hot band
    value (a simhash collision cluster) bounds per-bucket work the same
    way MinHash-LSH's band buckets do."""
    n_bands = max_hamming + 1
    band_bits = SIMHASH_BITS // n_bands
    mask = (1 << band_bits) - 1

    fps = simhash_fingerprints(docs)

    def to_bands(batch: pa.Table) -> pa.Table:
        fp = batch["simhash"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        frames = [pd.DataFrame({
            "band": b, "bval": (fp >> (band_bits * b)) & mask,
            "doc_id": ids, "fp": fp}) for b in range(n_bands)]
        out = pd.concat(frames, ignore_index=True)
        return pa.table({
            "band": pa.array(out["band"], pa.int64()),
            "bval": pa.array(out["bval"], pa.int64()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "fp": pa.array(out["fp"], pa.int64())})

    bands = fps.map_batches(to_bands, batch_format="pyarrow",
                            batch_size=None)

    def per_band_bucket(df: pd.DataFrame) -> pa.Table:
        m = df.drop_duplicates(["band", "bval", "doc_id"])
        j = m.merge(m, on=["band", "bval"])
        j = j[j["doc_id_x"] < j["doc_id_y"]]
        ham = np.zeros(len(j), dtype="int64")
        x = (j["fp_x"].to_numpy() ^ j["fp_y"].to_numpy()).astype("int64")
        for _ in range(SIMHASH_BITS):  # 16-step vectorized popcount
            ham += x & 1
            x >>= 1
        j = j.assign(hamming=ham)
        j = j[j["hamming"] <= max_hamming]
        out = j.rename(columns={"doc_id_x": "doc_a",
                                "doc_id_y": "doc_b"})
        return pa.table({
            "doc_a": pa.array(out["doc_a"], pa.int64()),
            "doc_b": pa.array(out["doc_b"], pa.int64()),
            "hamming": pa.array(out["hamming"], pa.int64())})

    cand = bucketed_group_apply(bands, ["band", "bval"], per_band_bucket,
                                num_buckets)

    def dedup_pairs(df: pd.DataFrame) -> pa.Table:
        out = df.drop_duplicates(["doc_a", "doc_b"])
        return pa.table({
            "doc_a": pa.array(out["doc_a"], pa.int64()),
            "doc_b": pa.array(out["doc_b"], pa.int64()),
            "hamming": pa.array(out["hamming"], pa.int64())})

    return bucketed_group_apply(cand, ["doc_a", "doc_b"], dedup_pairs,
                                num_buckets)


def ppjoin_pairs(docs: ray.data.Dataset, threshold_milli: int = 500,
                 num_buckets: int = 16) -> ray.data.Dataset:
    """Prefix-filtered set-similarity join (PPJoin-style blocking): all
    doc pairs whose DISTINCT-token Jaccard >= threshold, generated from
    prefix buckets instead of the full inverted index.

    Under a global token order (document frequency ASC, term ASC — rare
    tokens first), any pair with Jaccard >= t must share a token inside
    each side's first ``len - ceil(t*len) + 1`` tokens, so only prefix
    tokens enter the candidate exchange — strictly fewer candidates than
    the full-index join at the same exactness (candidates are then
    verified with the integer test ``(1000+t)*inter >= t*(sa+sb)`` and
    exact intersection sizes).

    Output: ``(doc_a, doc_b, inter, uni, jac_milli)``.

    Scale shape: token df counts reduce via the usual combiner (the
    global order is a BOUNDED broadcast here — vocabulary-sized; at web
    scale it swaps for a rank join, the tfidf df-exchange shape); each
    doc emits only its prefix tokens; candidate pairs dedup in a
    pair-keyed exchange where both sides' sorted token lists ride along,
    so verification is local to the bucket."""
    import math

    from dug_ray.shuffle import typed_table

    t = threshold_milli

    def tokset(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        parent = pc.list_parent_indices(tokens).to_numpy(
            zero_copy_only=False)
        flat = tokens.flatten().to_pandas().to_numpy(dtype=object)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"doc_id": ids[parent],
                           "term": flat}).drop_duplicates()
        return pa.table({
            "doc_id": pa.array(df["doc_id"], pa.int64()),
            "term": pa.array(df["term"], pa.string())})

    dt = docs.map_batches(tokset, batch_format="pyarrow",
                          batch_size=None).materialize()

    # global order: df ASC, term ASC (rare-first maximizes pruning)
    dfc = dt.groupby("term").count().to_pandas()
    order = {term: i for i, (_, term) in enumerate(
        sorted(zip(dfc["count()"], dfc["term"])))}

    def prefix_rows(df: pd.DataFrame) -> pa.Table:
        out = []
        for did, g in df.groupby("doc_id", sort=False):
            toks = sorted(g["term"], key=lambda x: order[x])
            n = len(toks)
            plen = n - math.ceil(t * n / 1000) + 1
            canon = "|".join(toks)
            out.extend((tok, int(did), n, canon)
                       for tok in toks[:plen])
        res = pd.DataFrame(out, columns=["term", "doc_id", "sz",
                                         "toks"])
        return typed_table(res, term=pa.string(), doc_id=pa.int64(),
                           sz=pa.int64(), toks=pa.string())

    prefixes = bucketed_group_apply(dt, "doc_id", prefix_rows,
                                    num_buckets)

    def candidates(df: pd.DataFrame) -> pa.Table:
        m = df.drop_duplicates(["term", "doc_id"])
        j = m.merge(m, on="term")
        j = j[j["doc_id_x"] < j["doc_id_y"]]
        j = j.drop_duplicates(["doc_id_x", "doc_id_y"])
        return typed_table(
            j.rename(columns={
                "doc_id_x": "doc_a", "doc_id_y": "doc_b",
                "sz_x": "sa", "sz_y": "sb",
                "toks_x": "ta", "toks_y": "tb"})[
                ["doc_a", "doc_b", "sa", "sb", "ta", "tb"]],
            doc_a=pa.int64(), doc_b=pa.int64(), sa=pa.int64(),
            sb=pa.int64(), ta=pa.string(), tb=pa.string())

    cand = bucketed_group_apply(prefixes, "term", candidates,
                                num_buckets)

    def verify(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["doc_a", "doc_b"])
        rows = []
        for r in df.itertuples():
            inter = len(set(r.ta.split("|")) & set(r.tb.split("|")))
            uni = int(r.sa) + int(r.sb) - inter
            if 1000 * inter >= t * uni:
                rows.append((r.doc_a, r.doc_b, inter, uni,
                             (inter * 1000) // uni))
        res = pd.DataFrame(rows, columns=["doc_a", "doc_b", "inter",
                                          "uni", "jac_milli"])
        return typed_table(res, doc_a=pa.int64(), doc_b=pa.int64(),
                           inter=pa.int64(), uni=pa.int64(),
                           jac_milli=pa.int64())

    return bucketed_group_apply(cand, ["doc_a", "doc_b"], verify,
                                num_buckets)
