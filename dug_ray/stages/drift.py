"""Distribution-drift metrics between corpus slices.

A training-data pipeline watches for drift between a slice (one language,
one source, one ingest window) and the corpus it feeds: here the two
classic checks, each pinned to exact integer output so the SQL oracles
hash-match.

* ``ks_statistic`` — two-sample Kolmogorov-Smirnov over a numeric column:
  the max CDF gap ``D`` reported as exact parts-per-million via pure
  integer arithmetic (``max|ca*Nb - cb*Na| * 1e6 // (Na*Nb)`` in Python
  ints — no float crosses engines).
* ``kl_by_group`` — per-group KL(group ‖ corpus) over the unigram term
  distribution with add-one smoothing, in exact integer micro-nats times
  the group's token count (the ``doc_surprisal`` quantization discipline:
  one libm ``ln`` per (group, term), floored per term, summed in int64).

Scale shape: both collapse input-sized data with per-batch combiners and
move only bounded aggregates.  KS exchanges O(distinct values x blocks)
rows and finishes with a driver cumsum over the value DOMAIN (bounded —
doc lengths, scores — never row count).  KL exchanges the (group, term,
n) count table: ONE term-keyed bucket exchange computes the corpus
marginal in-bucket, so the vocabulary is never broadcast or pulled to the
driver; only the per-group scalar totals (groups are bounded) and two
global scalars (token total, vocab size) leave the cluster.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dug_ray.shuffle import bucketed_group_apply, distinct_rows, typed_table


def ks_statistic(ds: ray.data.Dataset, value_col: str, flag_col: str,
                 flag_value: str, num_buckets: int = 8) -> pa.Table:
    """Two-sample KS between rows where ``flag_col == flag_value`` (sample
    A) and the rest (sample B), over integer ``value_col``.

    Returns one row ``(n_a, n_b, d_ppm)`` with ``d_ppm = floor(D * 1e6)``
    computed exactly: both CDFs are kept as integer cumulative counts and
    the division happens once, as integer division on Python ints (no
    int64 overflow at any scale)."""

    def partial(batch: pa.Table) -> pa.Table:
        is_a = pc.equal(batch[flag_col], flag_value)
        df = pd.DataFrame({
            "val": batch[value_col].to_numpy(zero_copy_only=False),
            "a_n": is_a.to_numpy(zero_copy_only=False).astype("int64")})
        df["b_n"] = 1 - df["a_n"]
        g = df.groupby("val", as_index=False).agg(
            a_n=("a_n", "sum"), b_n=("b_n", "sum"))
        return typed_table(g, val=pa.int64(), a_n=pa.int64(),
                           b_n=pa.int64())

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def merge(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("val", as_index=False).agg(
            a_n=("a_n", "sum"), b_n=("b_n", "sum"))
        return typed_table(g, val=pa.int64(), a_n=pa.int64(),
                           b_n=pa.int64())

    per_val = bucketed_group_apply(partials, "val", merge, num_buckets)

    # bounded driver final: one row per DISTINCT value (the value domain —
    # doc lengths, quality scores — not the row count)
    v = per_val.to_pandas().sort_values("val", kind="mergesort")
    na, nb = int(v["a_n"].sum()), int(v["b_n"].sum())
    ca = v["a_n"].cumsum().to_numpy()
    cb = v["b_n"].cumsum().to_numpy()
    # Python ints: ca*nb products exceed int64 past ~3e9 rows a side
    max_diff = max((abs(int(x) * nb - int(y) * na)
                    for x, y in zip(ca, cb)), default=0)
    d_ppm = (max_diff * 1_000_000) // (na * nb) if na and nb else 0
    return pa.table({"n_a": pa.array([na], pa.int64()),
                     "n_b": pa.array([nb], pa.int64()),
                     "d_ppm": pa.array([d_ppm], pa.int64())})


def kl_by_group(docs: ray.data.Dataset, group_col: str = "lang",
                num_buckets: int = 16) -> ray.data.Dataset:
    """Per-group smoothed KL(group ‖ corpus) over whitespace unigrams.

    For group L with term counts ``c_t`` (total ``n_L``) against corpus
    counts ``C_t`` (total ``N``, vocabulary ``V``), the reported integer is

        kl_unats_xn = sum_t c_t * floor(ln(ratio_t) * 1e6)
        ratio_t     = (f64(c_t) * f64(N+V)) / (f64(n_L) * f64(C_t+1))

    i.e. ``n_L x KL`` in micro-nats against the add-one-smoothed corpus
    model.  The single float expression per (group, term) is two exact
    int->f64 casts, one IEEE multiply each side, one divide, one libm
    ``ln`` — the oracle mirrors it token for token, so the result is
    hash-exact.  Output: ``(group, n_tokens, kl_unats_xn)``."""

    def pairs(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        parent = pc.list_parent_indices(tokens)
        t = pa.table({"group": pc.take(batch[group_col], parent),
                      "term": tokens.flatten()})
        return (t.group_by(["group", "term"])
                .aggregate([([], "count_all")])
                .rename_columns(["group", "term", "n"]))

    lt = docs.map_batches(pairs, batch_format="pyarrow",
                          batch_size=None).materialize()

    n_total = int(lt.sum("n"))
    v_total = distinct_rows(lt.select_columns(["term"]), ["term"]).count()
    # groups are bounded (languages, sources): a tiny driver dict broadcast
    nl = lt.groupby("group").sum("n").to_pandas()
    nl_map = dict(zip(nl["group"], nl["sum(n)"].astype("int64")))
    nv = float(n_total + v_total)

    def per_term_bucket(df: pd.DataFrame) -> pa.Table:
        # lt rows are per-BATCH partials: merge to true (group, term)
        # counts first — the log's argument must be the FULL c_t, not a
        # block fragment (w depends on c, unlike doc_surprisal's)
        df = df.groupby(["group", "term"], as_index=False)["n"].sum()
        ct = df.groupby("term")["n"].transform("sum").to_numpy()
        c = df["n"].to_numpy()
        group_n = df["group"].map(nl_map).to_numpy(dtype="float64")
        ratio = (c.astype("float64") * nv) / \
            (group_n * (ct + 1).astype("float64"))
        uniq, inv = np.unique(ratio, return_inverse=True)
        logs = np.fromiter((math.log(x) for x in uniq), dtype=np.float64,
                           count=len(uniq))
        w = np.floor(logs[inv] * 1e6).astype("int64")
        part = pd.DataFrame({"group": df["group"].to_numpy(),
                             "ptoks": c, "pkl": c * w})
        g = part.groupby("group", as_index=False).agg(
            ptoks=("ptoks", "sum"), pkl=("pkl", "sum"))
        return typed_table(g, group=pa.string(), ptoks=pa.int64(),
                           pkl=pa.int64())

    partials = bucketed_group_apply(lt, "term", per_term_bucket,
                                    num_buckets)

    def final(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("group", as_index=False).agg(
            n_tokens=("ptoks", "sum"), kl_unats_xn=("pkl", "sum"))
        return typed_table(g, group=pa.string(), n_tokens=pa.int64(),
                           kl_unats_xn=pa.int64())

    return bucketed_group_apply(partials, "group", final, 4)
