"""Referential-integrity audit: per-relation orphan / coverage profile.

The data-quality gate a pipeline runs before training joins: for each
declared FK relation (child.key -> parent.key) report how many child rows
dangle (no parent) and how many parent keys are never referenced.  The
reference validates element->concept linkage imperatively while indexing
(one dict probe per record); here the audit over the WHOLE relation set is
ONE exchange.

Scale shape:

* **One tagging pass per TABLE, not per relation.** A table that plays
  several roles (lineitem is the child of three relations; orders is a
  child and a parent) emits all its tagged partials from a single
  ``map_batches`` — the operator count is |tables| + |unions|, and Ray
  Data's per-operator fixed cost made a relation-at-a-time design ~2x
  slower on the same data.
* **Map-side combiners.** Child batches collapse to distinct (key, n),
  parents to distinct keys — the exchange carries key cardinality, not
  row count.
* **All relations share ONE composite-keyed exchange.** Rows are bucketed
  on (relation, key); a bucket task classifies orphan/childless for every
  (relation, key) it holds and emits ONE partial profile row per relation.
* **Driver-side final.** The bucket partials are ``num_buckets x
  |relations|`` rows at ANY data size, so the last merge is a bounded
  driver reduce (returns an Arrow table), not another all-to-all.

Keys are assumed non-null (the TPC-H-shaped inputs guarantee it; null
child keys would hash to one bucket and count as orphans).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dug_ray.hashing import md5_uint64
from dug_ray.shuffle import bucketed_group_apply, typed_table

PROFILE_COLS = ("n_child", "n_orphans", "n_orphan_keys", "n_parent_keys",
                "n_childless_parents")
PROFILE_TYPES = dict(relation=pa.string(),
                     **{c: pa.int64() for c in PROFILE_COLS})
_TAG_TYPES = dict(relation=pa.string(), k=pa.int64(), n=pa.int64(),
                  side=pa.int32())


def _tag_table(roles: list[tuple[str, str, int]]):
    """Batch tagger for one table: ``roles`` is [(key_col, relation,
    side)] with side 0=child (emit per-key counts) / 1=parent (emit
    distinct keys)."""

    def f(df: pd.DataFrame) -> pa.Table:
        outs = []
        for key, rel, side in roles:
            if side == 0:
                g = (df.groupby(key, as_index=False)
                     .size().rename(columns={key: "k", "size": "n"}))
            else:
                g = df[[key]].drop_duplicates().rename(columns={key: "k"})
                g["n"] = 0
            g["side"] = side
            g["relation"] = rel
            outs.append(g[["relation", "k", "n", "side"]])
        return typed_table(pd.concat(outs, ignore_index=True),
                           **_TAG_TYPES)

    return f


def fk_audit_many(specs: list[tuple[ray.data.Dataset, str,
                                    ray.data.Dataset, str, str]],
                  num_buckets: int = 8,
                  coalesce_blocks: int = 32) -> pa.Table:
    """ONE profile row per relation spec ``(child, child_key, parent,
    parent_key, relation)``.  Pass the SAME Dataset object for a table
    used by several specs — its roles fuse into one tagging operator.
    Inputs need only their key columns (prune at the read)."""
    roles: dict[int, tuple[ray.data.Dataset, list]] = {}
    for child, ckey, parent, pkey, rel in specs:
        roles.setdefault(id(child), (child, []))[1].append((ckey, rel, 0))
        roles.setdefault(id(parent), (parent, []))[1].append((pkey, rel, 1))

    tagged = None
    for ds, rl in roles.values():
        part = ds.map_batches(_tag_table(rl), batch_format="pandas",
                              batch_size=None)
        tagged = part if tagged is None else tagged.union(part)

    # the |tables|-way union feeds the sort exchange MANY tiny combiner
    # blocks; coalescing first more than halves wall time (22 -> 9 s at
    # sf0.01 — the bfs_levels block-count discipline)
    tagged = tagged.repartition(coalesce_blocks)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        # side is {0=child, 1=parent}: presence tests reduce to min/max —
        # vectorized, no per-key Python call
        g = df.groupby(["relation", "k"]).agg(
            n=("n", "sum"), lo=("side", "min"), hi=("side", "max"))
        g["has_c"] = g["lo"] == 0
        g["has_p"] = g["hi"] == 1
        g = g.reset_index()
        out = g.groupby("relation").apply(
            lambda r: pd.Series({
                "n_child": int(r["n"].sum()),
                "n_orphans": int(r.loc[~r["has_p"], "n"].sum()),
                "n_orphan_keys": int((r["has_c"] & ~r["has_p"]).sum()),
                "n_parent_keys": int(r["has_p"].sum()),
                "n_childless_parents":
                    int((r["has_p"] & ~r["has_c"]).sum()),
            }), include_groups=False).reset_index()
        return typed_table(out, **PROFILE_TYPES)

    partials = bucketed_group_apply(tagged, ["relation", "k"], per_bucket,
                                    num_buckets)

    # bounded driver final: num_buckets x |specs| rows regardless of scale
    df = partials.to_pandas()
    out = df.groupby("relation", as_index=False).agg(
        **{c: (c, "sum") for c in PROFILE_COLS})
    return typed_table(out, **PROFILE_TYPES)


def fk_audit(child: ray.data.Dataset, child_key: str,
             parent: ray.data.Dataset, parent_key: str,
             relation: str, num_buckets: int = 16) -> pa.Table:
    """Single-relation convenience wrapper over ``fk_audit_many``."""
    return fk_audit_many([(child, child_key, parent, parent_key,
                           relation)], num_buckets)

# ---------------------------------------------------------------
# Order-independent table fingerprints (see table_checksum docstring)
# ---------------------------------------------------------------

_SEP = "\x1f"  # unit separator: cannot appear in the cast columns


def _wrap_sum(s: pd.Series) -> np.uint64:
    """Wrapping (mod 2^64) sum — numpy uint64 addition wraps silently,
    which is exactly the oracle's ``sum(HUGEINT) % 2^64`` semantics."""
    return np.add.reduce(s.to_numpy(dtype=np.uint64), dtype=np.uint64)


def table_profile(ds: ray.data.Dataset, cols: list[str],
                  num_buckets: int = 8) -> ray.data.Dataset:
    """Per-column data-quality profile: row/null counts, EXACT distinct
    count, lexicographic min/max of the string form.

    One pass, one exchange: each batch melts the profiled columns to
    (col, val) string pairs, keeps the batch-DISTINCT pairs plus one
    count row per column (val NULL, n_rows/n_null populated) — so the
    exchange carries O(cols x distinct values + cols x blocks) rows,
    never the corpus.  Final per-column reduce inside the (col,) bucket.
    Output: ``(col, n_rows, n_null, n_distinct, min_val, max_val)``;
    min/max are over the STRING cast (the SQL mirror casts before
    min/max too, so int columns compare lexicographically on both
    sides).  At 100 TB a column whose distinct count approaches the row
    count (a key) still only moves its values once, pre-deduped per
    batch."""

    def partial(batch: pa.Table) -> pa.Table:
        frames = []
        for c in cols:
            s = pc.cast(batch[c], pa.string()).to_pandas()
            vals = s.dropna().drop_duplicates()
            frames.append(pd.DataFrame({
                "col": c, "val": vals, "n_rows": 0, "n_null": 0}))
            frames.append(pd.DataFrame({
                "col": [c], "val": [None], "n_rows": [len(s)],
                "n_null": [int(s.isna().sum())]}))
        out = pd.concat(frames, ignore_index=True)
        return typed_table(out, col=pa.string(), val=pa.string(),
                           n_rows=pa.int64(), n_null=pa.int64())

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def final(df: pd.DataFrame) -> pa.Table:
        rows = []
        for c, g in df.groupby("col", sort=False):
            # distinct-value rows carry a non-null val (count rows never
            # do: their val is NULL by construction, even for empty batches)
            vals = g.loc[g["val"].notna(), "val"].drop_duplicates()
            rows.append({
                "col": c,
                "n_rows": int(g["n_rows"].sum()),
                "n_null": int(g["n_null"].sum()),
                "n_distinct": int(len(vals)),
                "min_val": vals.min() if len(vals) else None,
                "max_val": vals.max() if len(vals) else None,
            })
        out = pd.DataFrame(rows, columns=["col", "n_rows", "n_null",
                                          "n_distinct", "min_val",
                                          "max_val"])
        return typed_table(out, col=pa.string(), n_rows=pa.int64(),
                           n_null=pa.int64(), n_distinct=pa.int64(),
                           min_val=pa.string(), max_val=pa.string())

    return bucketed_group_apply(partials, "col", final, num_buckets)


def table_checksum(ds: ray.data.Dataset, group_col: str,
                   cols: list[str], num_buckets: int = 8) -> ray.data.Dataset:
    """Per-``group_col`` order-independent fingerprint of ``cols``.

    Each row's canonical form is its columns cast to string and joined
    with ``\\x1f`` (reproduced by the SQL oracle with ``CAST .. AS
    VARCHAR`` + ``chr(31)``); the group checksum is the wrapping uint64
    sum of ``md5_uint64`` over canonical rows, formatted ``%016x``.
    Output: ``(group_col, n_rows:int64, checksum:utf8)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        strs = [pc.cast(batch[c], pa.string()) for c in cols]
        canon = strs[0] if len(strs) == 1 else \
            pc.binary_join_element_wise(*strs, _SEP)
        hv = md5_uint64(canon)
        df = pd.DataFrame({group_col: batch[group_col].to_pandas(),
                           "hv": hv})
        g = df.groupby(group_col, as_index=False).agg(
            chk=("hv", _wrap_sum), n=("hv", "size"))
        return typed_table(g, **{group_col: batch.schema.field(group_col).type},
                           chk=pa.uint64(), n=pa.int64())

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def final(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(group_col, as_index=False).agg(
            chk=("chk", _wrap_sum), n_rows=("n", "sum"))
        g["checksum"] = [format(int(v), "016x") for v in g["chk"]]
        gt = g[[group_col, "n_rows", "checksum"]]
        return typed_table(gt, **{group_col: pa.string()},
                           n_rows=pa.int64(), checksum=pa.string())

    return bucketed_group_apply(partials, group_col, final, num_buckets)
