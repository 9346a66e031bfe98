"""Vectorized oracle-exact md5 hashing.

Every deterministic operator in this engine that needs a cross-engine
reproducible hash (sampling thresholds, content dedup, minhash/simhash,
HLL) uses md5 because DuckDB's ``md5()`` is bit-identical to Python's
``hashlib.md5`` — the bridge that lets the SQL oracles pin hash-dependent
results exactly. Hashing row-by-row through ``hashlib`` is the one way to
make those operators the pipeline's bottleneck at 10^12 rows, so this
module runs the SAME md5 through a per-worker DuckDB connection over a
zero-copy Arrow projection of the batch: C-speed, vectorized, and still
bit-identical to the oracles (~100k values / 0.08 s single-threaded).

``ORDER BY i`` pins output order regardless of DuckDB's scan parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_CON = None


def _md5_col(values, expr: str) -> pa.Array:
    global _CON
    if _CON is None:
        import duckdb
        _CON = duckdb.connect()
        # one Ray worker == one CPU slot: a default connection would spin up
        # a whole-host thread pool PER WORKER (32 tasks x 32 threads of
        # oversubscription in exactly the hash-heavy stages); md5 over one
        # batch is fast single-threaded
        _CON.execute("SET threads TO 1")
        _CON.execute("SET memory_limit = '512MB'")
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    arr = values if isinstance(values, pa.Array) else pa.array(np.asarray(values))
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    t = pa.table({"i": pa.array(np.arange(len(arr)), pa.int64()), "v": arr})
    _CON.register("_t_md5", t)
    out = _CON.execute(f"SELECT {expr} AS h FROM _t_md5 ORDER BY i").arrow()
    _CON.unregister("_t_md5")
    col = out.column("h")
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def md5_hex(values, n: int = 32) -> np.ndarray:
    """First ``n`` hex chars of md5 (== hashlib.md5(...).hexdigest()[:n])
    as an object ndarray of strings."""
    expr = "md5(v)" if n >= 32 else f"substr(md5(v), 1, {n})"
    return _md5_col(values, expr).to_numpy(zero_copy_only=False)


def md5_int(values) -> np.ndarray:
    """First 8 hex chars of md5 as int64 (the sampling-threshold form:
    ``int(hexdigest()[:8], 16)``)."""
    return _md5_col(
        values, "CAST(('0x' || substr(md5(v), 1, 8)) AS BIGINT)").to_numpy()


def md5_u60(values) -> np.ndarray:
    """First 15 hex chars of md5 as int64 — a 60-bit uniform draw
    (``int(hexdigest()[:15], 16)``, the A-ES / bootstrap form: 60 bits
    keeps every value exactly representable in both BIGINT and float64)."""
    return _md5_col(
        values, "CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT)").to_numpy()


def md5_uint64(values) -> np.ndarray:
    """First 8 md5 BYTES big-endian as uint64 (the sketch form:
    ``int.from_bytes(digest()[:8], 'big')`` == first 16 hex chars)."""
    return _md5_col(
        values, "CAST(('0x' || substr(md5(v), 1, 16)) AS UBIGINT)").to_numpy()
