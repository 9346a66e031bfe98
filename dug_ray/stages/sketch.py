"""Mergeable sketches: HyperLogLog distinct counting.

The custom-operator class the round brief calls out (a sketch Ray Data
lacks): per-batch partial sketches (one serialized register array per
batch — the combiner), merged associatively in a tiny final stage.
Deterministic (md5-based hashing), so estimates are reproducible run to
run; accuracy ~1.04/sqrt(2^p).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

P = 10          # 2^10 = 1024 registers -> ~3% standard error
M = 1 << P


def _alpha(m: int) -> float:
    return 0.7213 / (1 + 1.079 / m)


def _hash64(values) -> np.ndarray:
    """First 8 md5 bytes big-endian as uint64, vectorized (bit-identical
    to int.from_bytes(hashlib.md5(v).digest()[:8], 'big'))."""
    from dug_ray.hashing import md5_uint64
    return md5_uint64(np.asarray(values, dtype=object))


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (no float log2 — values
    above 2^53 would round)."""
    bl = np.zeros(len(v), dtype=np.int64)
    w = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        ge = w >= np.uint64(1 << s)
        bl += ge * s
        w = np.where(ge, w >> np.uint64(s), w)
    return bl + (w > 0)


def _registers(values) -> np.ndarray:
    """HLL register array for an iterable of strings.

    rank = position of the first 1-bit in the low 64-P hash bits (1-based),
    capped at 64-P+1 when they are all zero — i.e. ``(64-P+1) - bit_length``,
    computed with exact integer bit lengths."""
    h = _hash64(values)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - P)) - 1)
    rank = (64 - P + 1) - _bit_length(rest)
    regs = np.zeros(M, dtype=np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def estimate(regs: np.ndarray) -> float:
    """HLL estimate from merged registers, bit-identical to the SQL oracle.

    The inverse power sum ``sum(2^-r)`` is order-sensitive in float math,
    so it is computed as the EXACT integer ``N = sum(2^(55-r))`` (Python
    int; denominator 2^55), then a single float expression that DuckDB
    evaluates identically (SQL_HLL_DISTINCT mirrors it term for term:
    HUGEINT shift sum, one cast, one division chain, libm ln).  That turns
    the estimate itself — not just the register state — into a hash-match
    oracle row."""
    assert M == 1024, "estimate() literals mirror the P=10 SQL oracle"
    counts = np.bincount(regs.astype(np.int64), minlength=56)
    n = sum(int(c) << (55 - r) for r, c in enumerate(counts) if c)
    e = 0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0 / (n / 36028797018963968)
    zeros = int(counts[0])
    if e <= 2.5 * M and zeros:
        e = 1024.0 * math.log(1024.0 / zeros)  # small-range correction
    return float(e)


def hll_distinct_tokens(docs: ray.data.Dataset, by: str | None = None) -> pd.DataFrame:
    """Approximate distinct token count, optionally grouped by a column.

    Per-batch partial sketches -> associative register max-merge. The
    merged state is O(groups x 1KB) regardless of corpus size — the
    defining property of a sketch pipeline."""

    merged = _merge_partial_registers(docs, by)
    return pd.DataFrame(
        [{"key": k, "approx_distinct": estimate(v)}
         for k, v in sorted(merged.items(), key=_null_last)])


def _null_last(kv):
    """Sort key for merged sketch items: null group key sorts after all
    strings (SQL NULLS LAST), so mixed None/str keys don't TypeError."""
    return (kv[0] is None, kv[0] or "")


def _merge_partial_registers(docs: ray.data.Dataset, by: str | None) -> dict[str, np.ndarray]:
    """Run the partial-sketch stage and OR-merge the per-batch register
    arrays (associative max per register) — shared by the estimate and the
    register-summary paths."""
    partial = docs.map_batches(_partial_sketches(by),
                               batch_format="pyarrow", batch_size=None)
    merged: dict[str, np.ndarray] = {}
    for b in partial.iter_batches(batch_size=None, batch_format="pyarrow"):
        for k, r in zip(b.column("key").to_pylist(), b.column("regs").to_pylist()):
            regs = np.frombuffer(r, dtype=np.int8)
            merged[k] = np.maximum(merged.get(k, np.zeros(M, np.int8)), regs)
    return merged


def _partial_sketches(by: str | None):
    """Batch fn: one serialized register array per group key in the batch.
    Grouping is a vectorized pandas distinct+groupby (a Python loop only
    over GROUPS, never rows)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = tokens.flatten().to_numpy(zero_copy_only=False)
        if by is None:
            groups = [("_all", np.unique(flat))]
        else:
            parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
            keys = np.asarray(batch.column(by).to_pylist(), dtype=object)
            df = pd.DataFrame({"k": keys[parent], "t": flat}).drop_duplicates()
            # dropna=False: a null group key forms one group (the engine's
            # null-key contract, shuffle.py) instead of silently losing
            # those docs' tokens from every sketch
            groups = [(None if (not isinstance(k, str) and pd.isna(k)) else k,
                       g["t"].to_numpy())
                      for k, g in df.groupby("k", sort=False, dropna=False)]
        # typed build (not from_pandas): empty or all-null-key batches must
        # still carry (string, binary), not inferred null types
        return pa.table({
            "key": pa.array([k for k, _ in groups], pa.string()),
            "regs": pa.array([_registers(v).tobytes() for _, v in groups],
                             pa.binary()),
        })

    return per_batch


def hll_register_summary(docs: ray.data.Dataset, by: str) -> pd.DataFrame:
    """EXACT view of the merged sketch state per group — integer register
    aggregates + a digest of the (idx, rank) pairs. Unlike the float
    estimate (whose 2^-r summation is order-sensitive across engines), this
    is fully SQL-mirrorable, so the sketch pipeline itself gets a
    hash-match oracle. Columns: key, n_regs, reg_sum, reg_digest."""
    merged = _merge_partial_registers(docs, by)
    rows = []
    for k, regs in sorted(merged.items(), key=_null_last):
        nz = np.flatnonzero(regs)
        digest = hashlib.md5("|".join(
            f"{i}:{int(regs[i])}" for i in nz).encode()).hexdigest()
        rows.append({"key": k, "n_regs": int(len(nz)),
                     "reg_sum": int(regs[nz].sum()), "reg_digest": digest})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable frequency estimation
# ---------------------------------------------------------------------------

CMS_D = 4    # hash rows
CMS_W = 16   # counters per row (small so collisions actually occur on the
             # synthetic 31-term vocabulary; at real scale raise to 2^16+)


def _cms_indices(hv: np.ndarray, salt: int) -> np.ndarray:
    """Row-``salt``'s counter index: byte ``salt`` of the 64-bit md5 prefix
    masked to CMS_W.  One md5 pass yields all CMS_D hash functions (md5
    bytes are independent uniform), and the SQL oracle reproduces the
    expression verbatim: ``(hv >> 8*s) & (CMS_W-1)``."""
    return ((hv >> np.uint64(8 * salt)) & np.uint64(CMS_W - 1)).astype("int64")


def cms_registers(docs: ray.data.Dataset,
                  num_buckets: int = 4) -> ray.data.Dataset:
    """Count-Min sketch of corpus term frequencies (occurrences WITH
    multiplicity, unlike HLL's distinct stream).  Output: the dense
    register table ``(salt, idx, cnt)`` — CMS_D x CMS_W rows at any corpus
    size, the defining mergeable-sketch property (point additions commute,
    so per-batch partial registers sum associatively across blocks,
    retries, and resumed partitions).

    Scale shape: each batch collapses to at most CMS_D x CMS_W partial
    rows (value_counts + one md5 over DISTINCT batch terms, byte-sliced
    into the D indices); the exchange is O(blocks x D x W); the final
    per-salt merge densifies missing counters to 0."""

    def partial(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        vc = tokens.flatten().value_counts()
        from dug_ray.hashing import md5_uint64
        hv = md5_uint64(vc.field("values"))
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        frames = [pd.DataFrame({"salt": s, "idx": _cms_indices(hv, s),
                                "cnt": counts}) for s in range(CMS_D)]
        g = (pd.concat(frames, ignore_index=True)
             .groupby(["salt", "idx"], as_index=False)["cnt"].sum())
        return pa.table({"salt": pa.array(g["salt"], pa.int64()),
                         "idx": pa.array(g["idx"], pa.int64()),
                         "cnt": pa.array(g["cnt"], pa.int64())})

    partials = docs.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)

    def per_salt(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for s, g in df.groupby("salt", sort=False):
            dense = np.zeros(CMS_W, dtype=np.int64)
            np.add.at(dense, g["idx"].to_numpy(), g["cnt"].to_numpy())
            out.append(pd.DataFrame({"salt": int(s),
                                     "idx": np.arange(CMS_W, dtype=np.int64),
                                     "cnt": dense}))
        res = pd.concat(out, ignore_index=True)
        return pa.table({"salt": pa.array(res["salt"], pa.int64()),
                         "idx": pa.array(res["idx"], pa.int64()),
                         "cnt": pa.array(res["cnt"], pa.int64())}).to_pandas()

    from dug_ray.shuffle import bucketed_group_apply
    return bucketed_group_apply(partials, "salt", per_salt, num_buckets)


def cms_estimate(docs: ray.data.Dataset, probes: list[str]) -> pa.Table:
    """Point-frequency estimates for ``probes`` from the merged CMS,
    side-by-side with the exact counts (the overestimate is visible where
    terms collide).  The register table is CMS_D x CMS_W rows at ANY
    corpus size, so pulling it to the driver for the probe lookup is a
    bounded O(1) read, not a materialization; the exact counts come from a
    per-batch ``is_in`` combiner (O(probes x blocks) exchange)."""
    regs = cms_registers(docs).to_pandas()
    grid = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    grid[regs["salt"].to_numpy(), regs["idx"].to_numpy()] = \
        regs["cnt"].to_numpy()

    from dug_ray.hashing import md5_uint64
    hv = md5_uint64(np.asarray(probes, dtype=object))
    est = np.min(np.stack([grid[s, _cms_indices(hv, s)]
                           for s in range(CMS_D)]), axis=0)

    probe_set = pa.array(probes, pa.string())

    def true_partial(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = tokens.flatten()
        hit = flat.filter(pc.is_in(flat, value_set=probe_set))
        vc = hit.value_counts()
        return pa.table({"term": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    tp = (docs.map_batches(true_partial, batch_format="pyarrow",
                           batch_size=None)
          .groupby("term").sum("n").to_pandas())
    true_map = dict(zip(tp["term"], tp["sum(n)"].astype("int64")))

    return pa.table({
        "term": pa.array(probes, pa.string()),
        "est_count": pa.array(est, pa.int64()),
        "true_count": pa.array([int(true_map.get(t, 0)) for t in probes],
                               pa.int64()),
    })


# ---------------------------------------------------------------------------
# Bloom filter registers
# ---------------------------------------------------------------------------
# Third mergeable sketch family next to HLL (distinct count) and CMS
# (point frequency): set MEMBERSHIP.  Same md5 bridge — byte-sliced
# 64-bit md5 prefix gives all BLOOM_K hash functions, reproduced
# verbatim by the SQL oracle as (hv >> 8*s) & (BLOOM_M - 1).

BLOOM_M = 256   # bits (small so saturation is visible at test scale)
BLOOM_K = 4     # hash functions


def bloom_registers(docs: ray.data.Dataset) -> pa.Table:
    """Bloom filter over the corpus's DISTINCT term set.  Output: the
    dense bit table ``(bit_idx, bit)`` — exactly BLOOM_M rows at any
    corpus size.  Bit-OR is the merge, so per-batch partial index sets
    union associatively across blocks, retries, and resumed partitions
    (same mergeability contract as cms_registers above).

    Scale shape: each batch collapses to at most BLOOM_M sparse rows
    (one md5 over the batch's distinct terms, byte-sliced into the K
    indices, then np.unique); the exchange is a distinct over <=
    blocks x BLOOM_M rows; the final densify is driver-side over a
    BLOOM_M-bounded table."""

    def partial(batch: pa.Table) -> pa.Table:
        tokens = pc.split_pattern(batch["text"], " ")
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        terms = tokens.flatten().unique()
        from dug_ray.hashing import md5_uint64
        hv = md5_uint64(terms)
        idx = np.unique(np.concatenate(
            [((hv >> np.uint64(8 * s)) & np.uint64(BLOOM_M - 1))
             .astype("int64") for s in range(BLOOM_K)])) if len(hv) \
            else np.empty(0, dtype=np.int64)
        return pa.table({"bit_idx": pa.array(idx, pa.int64())})

    from dug_ray.shuffle import distinct_rows
    sparse = distinct_rows(
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["bit_idx"]).to_pandas()
    dense = np.zeros(BLOOM_M, dtype=np.int64)
    if len(sparse):
        dense[sparse["bit_idx"].to_numpy()] = 1
    return pa.table({"bit_idx": pa.array(np.arange(BLOOM_M), pa.int64()),
                     "bit": pa.array(dense, pa.int64())})
