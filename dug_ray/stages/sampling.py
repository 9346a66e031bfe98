"""Deterministic sampling + decontamination operators.

The remaining training-data-curation family (beyond the 10% holdout of
``q_doc_sample`` and the stratified split):

- ``group_sample``: uniform k-per-group sample — the k docs with the
  smallest ``md5(doc_id)`` per source. Content-independent and
  reproducible across engines/runs; shaped as a per-batch partial top-k
  (combiner) + bucketed exact merge, so only O(batches x groups x k) rows
  ever move.
- ``mixture_sample``: weighted source mixing — each source keeps a
  deterministic fraction of its docs (md5 threshold compared in INTEGER
  space: first 8 hex chars < w * 2^30, w in quarters — exact on both
  engines). The knob a pretraining pipeline turns to re-weight domains.
  ``mixture_sample_rows`` emits the kept rows themselves (the dataset a
  mixer actually feeds downstream); ``mixture_sample`` reports counts.
- ``decontaminate``: benchmark decontamination — flag corpus docs sharing
  any word-3-gram with the designated eval set. The eval set is SMALL by
  definition, so its distinct shingles are collected once and broadcast
  (``ray.put``); each batch counts its docs' distinct shingles against the
  set vectorized. No shuffle touches the corpus side.

All md5 hashing goes through :mod:`dug_ray.hashing` (``md5_int``) —
DuckDB's vectorized C++ ``md5()`` over an Arrow batch (bit-identical to
the SQL oracles), not a per-row Python ``hashlib`` loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dug_ray.hashing import md5_int  # noqa: F401 — re-export (query callers)
from dug_ray.shuffle import bucketed_group_apply


def group_sample(docs: ray.data.Dataset, k: int = 5) -> ray.data.Dataset:
    """k-per-source uniform sample by md5 order. Output: source, doc_id,
    sample_rank (1-based by (md5 value, doc_id); fixed-width hex order ==
    integer order, so sorting the int64 hash matches the oracle's hex sort)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["source", "doc_id"]]
        df["h"] = md5_int(df["doc_id"].to_numpy())
        df = df.sort_values(["source", "h", "doc_id"], kind="mergesort")
        top = df.groupby("source").head(k)
        # typed build: from_pandas on an empty frame would infer null-typed
        # columns and leak divergent block schemas into the shuffle
        return pa.table({
            "source": pa.array(top["source"], pa.string()),
            "doc_id": pa.array(top["doc_id"].to_numpy(), pa.int64()),
            "h": pa.array(top["h"].to_numpy(), pa.int64()),
        })

    partials = docs.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "h", "doc_id"], kind="mergesort")
        df = df.groupby("source").head(k)
        df["sample_rank"] = df.groupby("source").cumcount() + 1
        return df[["source", "doc_id", "sample_rank"]]

    return bucketed_group_apply(partials, "source", merge, 8)


# Explicit pretraining mixture weights, in quarters (keep fraction =
# quarters/4 of the 2^32 first-8-hex md5 space).  A real mixer hands this
# map in per run; this module-level fixture re-weights several domains
# non-trivially (vs their fallback) so the oracle compare exercises the
# lookup.  Any source absent from the map falls back to the deterministic
# len(source)%3+1 stand-in, so unconfigured corpora still mix.
MIXTURE_WEIGHTS: dict[str, int] = {
    "src0": 4,    # keep everything (high-quality domain)
    "src1": 1,    # aggressive down-weight
    "src7": 3,
    "src12": 2,
    "src19": 4,
}


def mixture_quarters(sources, weights: dict[str, int] | None = None) -> np.ndarray:
    """Vectorized quarters lookup: ``weights[source]`` when mapped, else
    ``len(source) % 3 + 1``.  ``weights=None`` means the module fixture
    (what the registered queries and their SQL oracles use).

    Returns float64 with NaN for a NULL source — the SQL semantics
    (``length(NULL)%3+1`` is NULL): the keep comparison is then False (the
    doc is dropped) and the reported weight is null, never a garbage
    int-cast of NaN."""
    w = MIXTURE_WEIGHTS if weights is None else weights
    s = pd.Series(np.asarray(sources, dtype=object))
    fall = s.str.len().to_numpy(dtype=np.float64, na_value=np.nan) % 3 + 1
    mapped = s.map(w)
    return np.where(mapped.notna(), mapped.fillna(0), fall).astype(np.float64)


def _mixture_kept_mask(df: pd.DataFrame,
                       weights: dict[str, int] | None = None) -> np.ndarray:
    """Deterministic keep mask: md5 int < weight_quarters * 2^30 with
    weight_quarters from ``mixture_quarters`` (integer-exact both engines;
    NaN quarters — null source — compare False, the SQL WHERE-NULL drop)."""
    h = md5_int(df["doc_id"].to_numpy())
    wq = mixture_quarters(df["source"], weights)
    return h < wq * (1 << 30)


def mixture_sample(docs: ray.data.Dataset,
                   weights: dict[str, int] | None = None) -> ray.data.Dataset:
    """Weighted source mixture COUNTS: source keeps fraction
    weight_quarters/4 of its docs (``mixture_quarters`` map + fallback).
    Output per source: n_total, n_kept, weight_quarters."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["source", "doc_id"]]
        df["kept"] = _mixture_kept_mask(df, weights)
        # dropna=False: a NULL source forms one reported group (SQL GROUP BY
        # keeps it) with n_kept 0 — not a silently vanished row set
        g = df.groupby("source", as_index=False, dropna=False).agg(
            n_total=("doc_id", "size"), n_kept=("kept", "sum"))
        # typed build (see group_sample.partial)
        return pa.table({
            "source": pa.array(g["source"], pa.string(), from_pandas=True),
            "n_total": pa.array(g["n_total"].to_numpy(), pa.int64()),
            "n_kept": pa.array(g["n_kept"].to_numpy(), pa.int64()),
        })

    partials = docs.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False, dropna=False).agg(
            n_total=("n_total", "sum"), n_kept=("n_kept", "sum"))
        # nullable Int64: a NULL source's weight is null (SQL length(NULL)),
        # never an int cast of NaN
        g["weight_quarters"] = pd.array(
            mixture_quarters(g["source"], weights), dtype="Int64")
        return g

    merged = bucketed_group_apply(partials, "source", merge, 8)

    def fin(batch: pa.Table) -> pa.Table:
        # rebuilt fresh: a pandas-Int64 block would otherwise round-trip its
        # extension dtype through Arrow schema metadata all the way to the
        # driver compare (dtype Int64 != the oracle's int64)
        return pa.table({
            "source": pc.cast(batch["source"], pa.string()),
            "n_total": pc.cast(batch["n_total"], pa.int64()),
            "n_kept": pc.cast(batch["n_kept"], pa.int64()),
            "weight_quarters": pc.cast(batch["weight_quarters"], pa.int64()),
        })

    return merged.map_batches(fin, batch_format="pyarrow", batch_size=None)


def mixture_sample_rows(docs: ray.data.Dataset,
                        weights: dict[str, int] | None = None) -> ray.data.Dataset:
    """Row-emitting weighted source mixture: the kept docs themselves —
    what a pretraining mixer actually feeds downstream. Pure per-batch
    filter (no shuffle, no driver traffic). Output: source, doc_id."""

    def per_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["source", "doc_id"]]
        kept = df[_mixture_kept_mask(df, weights)]
        return pa.table({
            "source": pa.array(kept["source"], pa.string()),
            "doc_id": pa.array(kept["doc_id"].to_numpy(), pa.int64()),
        })

    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


# decontamination probe set: built once per worker per broadcast ref
# (single-slot cache — a new eval set replaces the old array)
_PROBE_CACHE: dict[str, pa.Array] = {}


def _probe_array(ref) -> pa.Array:
    key = ref.hex()
    arr = _PROBE_CACHE.get(key)
    if arr is None:
        _PROBE_CACHE.clear()
        arr = pa.array(ray.get(ref), pa.string())
        _PROBE_CACHE[key] = arr
    return arr


def decontaminate(docs: ray.data.Dataset, bench_mod: int = 97) -> ray.data.Dataset:
    """Benchmark decontamination: corpus docs (doc_id % bench_mod != 0)
    sharing >= 1 word-3-gram with the eval set (doc_id % bench_mod == 0).
    Output: doc_id, n_contam (count of distinct contaminated shingles)."""
    from dug_ray.stages.dedup import _shingle_df

    def bench_filter(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % bench_mod == 0))

    bench_sh = (docs.map_batches(bench_filter, batch_format="pyarrow", batch_size=None)
                .map_batches(lambda b: pa.table({"shingle": pa.array(
                    _shingle_df(b)["shingle"].drop_duplicates(), pa.string())}),
                    batch_format="pyarrow", batch_size=None))
    # the eval set is small by definition -> its shingle set broadcasts
    bench_set = set()
    for b in bench_sh.iter_batches(batch_size=None, batch_format="pyarrow"):
        bench_set.update(b.column("shingle").to_pylist())
    ref = ray.put(sorted(bench_set))

    def per_batch(batch: pa.Table) -> pa.Table:
        probe = _probe_array(ref)  # built once per worker, not per batch
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % bench_mod != 0))
        sh = _shingle_df(batch)
        if sh.empty:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_contam": pa.array([], pa.int64())})
        hit = pc.is_in(pa.array(sh["shingle"]), value_set=probe)
        sh = sh[hit.to_numpy(zero_copy_only=False)]
        g = sh.groupby("doc_id", as_index=False).agg(n_contam=("shingle", "size"))
        return pa.table({"doc_id": pa.array(g["doc_id"], pa.int64()),
                         "n_contam": pa.array(g["n_contam"], pa.int64())})

    return docs.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def weighted_sample(docs: ray.data.Dataset, k: int = 20) -> ray.data.Dataset:
    """Efraimidis-Spirakis weighted sampling WITHOUT replacement: the
    ``k`` docs with the smallest exponential arrival key
    ``-ln(u) / w`` where ``u = (md5_32(doc_id) + 1) / 2^32`` and the
    weight ``w`` is ``n_chars`` — longer docs proportionally likelier,
    the standard one-pass weighted reservoir at corpus scale (A-ES,
    Efraimidis & Spirakis 2006).

    Deterministic and oracle-exact: ``u`` is integer-derived (same md5
    bridge as every sampler here), and the key is ONE float expression
    over exact ints evaluated by libm ``log`` on both engines (the
    tf-idf discipline).  Shape: per-batch key + local top-k combiner,
    so only ``k`` rows per block reach the bounded final merge — the
    whole corpus is never sorted.

    Output: (doc_id, source, n_chars, skey, rank), rank 1..k by
    (skey asc, doc_id asc)."""
    import math

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["doc_id", "source", "n_chars"]]
        h = md5_int(df["doc_id"].to_numpy())
        # u in (0, 1]: never ln(0); floats exact (h+1 <= 2^32 << 2^53)
        u = (h.astype(np.float64) + 1.0) * 2.0 ** -32
        w = df["n_chars"].to_numpy().astype(np.float64)
        # libm log (math.log), not np.log: DuckDB's ln is libm, np.log's
        # SIMD path can differ in the last ulp (tf-idf/PMI discipline).
        # The scalar loop is not this stage's bottleneck — the md5 above
        # costs more per row than libm log.
        logs = np.fromiter((math.log(x) for x in u), dtype=np.float64,
                           count=len(u))
        df["skey"] = -logs / w
        df = df.sort_values(["skey", "doc_id"], kind="mergesort").head(k)
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "source": pa.array(df["source"], pa.string()),
            "n_chars": pa.array(df["n_chars"].to_numpy(), pa.int64()),
            "skey": pa.array(df["skey"].to_numpy(), pa.float64()),
        })

    partials = docs.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
    # bounded final: <= k x num_blocks candidate rows
    df = (partials.to_pandas()
          .sort_values(["skey", "doc_id"], kind="mergesort").head(k)
          .reset_index(drop=True))
    df["rank"] = (df.index + 1).astype("int64")
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
        "source": pa.array(df["source"], pa.string()),
        "n_chars": pa.array(df["n_chars"].to_numpy(), pa.int64()),
        "skey": pa.array(df["skey"].to_numpy(), pa.float64()),
        "rank": pa.array(df["rank"].to_numpy(), pa.int64()),
    }))
