"""Similarity search over the embeddings table (list<float> vectors).

Beyond-reference ops for training-data pipelines:

- ``ann_topk``: brute-force cosine top-k — the scale pattern is a broadcast
  query matrix (``ray.put`` once) with a numpy matmul per streamed batch,
  plus a per-batch partial top-k (combiner) so only
  O(batches x queries x k) candidate rows ever leave the workers.
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH buckets
  restrict each query to candidates sharing a code (documented recall
  trade-off; deterministic seeded planes).
- ``neardup_pairs``: all pairs above a cosine threshold via blocked
  matmul of streamed batches against the broadcast matrix.

Float determinism: all math in float64 (embeddings are float32 in parquet;
upcast is exact) so ranking matches DuckDB's ``list_cosine_similarity`` on
``DOUBLE[]`` up to summation-order ulps; ties broken by vec_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(batch)
    return flat.reshape(len(batch), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _stack(series) -> np.ndarray:
    """Pandas-side twin of _matrix: list-of-float column -> (n, dim) float64."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def read_embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _topk_idx(sims: np.ndarray, vids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (cos desc, vec_id asc) — the ORACLE's
    tie-break applied already at the combiner, so equal cosines straddling
    the per-batch k boundary keep the smallest vec_ids (bare argpartition
    keeps an arbitrary one). O(n) partition to the k-th value, then a sort
    over only the >=threshold candidates (ties included)."""
    n = len(sims)
    if n <= k:
        return np.lexsort((vids, -sims))
    kth = np.partition(sims, n - k)[n - k]  # k-th largest value
    cand = np.flatnonzero(sims >= kth)      # everything at/above it (ties too)
    order = np.lexsort((vids[cand], -sims[cand]))
    return cand[order[:k]]


def _finalize_topk(partials: ray.data.Dataset, k: int,
                   num_buckets: int = 16) -> ray.data.Dataset:
    """DISTRIBUTED exact merge of the per-batch top-k partials: bucket the
    partial rows by ``query_id`` so each bucket task sees every candidate of
    its queries, then rank (cos desc, vec_id asc) and keep the first k —
    the same grouped-apply exchange the rest of the engine uses, so top-k
    merging scales to any query count (the round-4 driver-side
    ``to_pandas`` merge was the wrong shape past toy query workloads).
    Shuffle volume is O(batches x queries x k) tiny candidate rows."""
    from dug_ray.shuffle import bucketed_group_apply

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "cos", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
        df["rank"] = df.groupby("query_id").cumcount() + 1
        return (df.loc[df["rank"] <= k, ["query_id", "vec_id", "rank"]]
                .astype({"query_id": "int64", "vec_id": "int64",
                         "rank": "int64"}))

    out = bucketed_group_apply(partials, "query_id", per_bucket, num_buckets)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({c: pc.cast(batch[c], pa.int64())
                         for c in ("query_id", "vec_id", "rank")})

    return out.map_batches(fin, batch_format="pyarrow", batch_size=None)


def ann_topk(sf_dir: str, n_queries: int = 4, k: int = 10) -> ray.data.Dataset:
    """Top-k cosine neighbors among vec_id >= n_queries for each query
    vector (vec_id < n_queries). Output: query_id, vec_id, rank."""
    emb = read_embeddings(sf_dir)
    # small side: collect the query vectors once, broadcast via ray.put
    q_df = emb.filter(expr=f"vec_id < {n_queries}").to_pandas()
    q_df = q_df.sort_values("vec_id")
    qm = _normalize(_stack(q_df["embedding"]))
    q_ids = q_df["vec_id"].to_numpy()
    q_ref = ray.put((q_ids, qm))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids, qmat = ray.get(q_ref)
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mask = vid >= n_queries
        if not mask.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        m = _normalize(_matrix(batch)[mask])
        vid = vid[mask]
        sims = qmat @ m.T  # (q, n)
        rows = []
        for qi in range(sims.shape[0]):
            # per-batch partial top-k (combiner) with the oracle tie-break
            for j in _topk_idx(sims[qi], vid, k):
                rows.append((int(ids[qi]), int(vid[j]), float(sims[qi, j])))
        out = pd.DataFrame(rows, columns=["query_id", "vec_id", "cos"])
        from dug_ray.shuffle import typed_table
        return typed_table(out, query_id=pa.int64(), vec_id=pa.int64(),
                           cos=pa.float64())

    partials = emb.map_batches(partial_topk, batch_format="pyarrow", batch_size=None)
    # final: tiny (queries x k x batches) — exact distributed merge
    return _finalize_topk(partials, k)


def neardup_pairs(sf_dir: str, threshold: float = 0.4, n_blocks: int = 4,
                  mode: str = "blocked") -> ray.data.Dataset:
    """All embedding pairs with cosine > threshold (vec_id_a < vec_id_b).
    EXACT (no candidate pruning) in both modes.

    ``mode="blocked"`` (default, the scale path): vectors are hashed into
    ``n_blocks`` blocks by vec_id and each row is replicated to the
    ``n_blocks`` block-PAIR groups containing its block; each group task
    holds exactly two blocks and emits their cross (or within-block) pairs.
    Nothing is ever collected to the driver: shuffle volume is
    O(N x n_blocks) embedding rows, per-task memory is two blocks — size
    ``n_blocks ~ sqrt(N / block_capacity)`` at corpus scale. A pair lands in
    exactly one group (its sorted block pair), so the output is exact and
    duplicate-free.

    ``mode="broadcast"`` (opt-in oracle mode for small corpora): the full
    normalized matrix is broadcast once via ``ray.put`` and each streamed
    batch matmuls against it."""
    emb = read_embeddings(sf_dir)
    if mode == "broadcast":
        return _neardup_pairs_broadcast(emb, threshold)

    from dug_ray.shuffle import bucketed_group_apply

    def replicate(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        blk = (vid % n_blocks).astype(np.int64)
        blk_col = pa.array(blk)
        tables = []
        for other in range(n_blocks):
            lo, hi = np.minimum(blk, other), np.maximum(blk, other)
            # vectorized int64 pair key (sorted pair): lo * n_blocks + hi —
            # no per-row string formatting, and ints hash/shuffle cheaper
            key = pa.array(lo * n_blocks + hi, pa.int64())
            tables.append(batch.append_column("blk", blk_col)
                          .append_column("pair_key", key))
        return pa.concat_tables(tables)

    rep = emb.map_batches(replicate, batch_format="pyarrow", batch_size=None)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for key, g in df.groupby("pair_key", sort=False):
            i, j = divmod(int(key), n_blocks)
            gi = g[g["blk"] == i].drop_duplicates(subset=["vec_id"])
            gj = g[g["blk"] == j].drop_duplicates(subset=["vec_id"])
            if not len(gi) or not len(gj):
                continue
            mi = _normalize(_stack(gi["embedding"]))
            vi = gi["vec_id"].to_numpy()
            if i == j:
                # within-block: the matrix is symmetric, keep one triangle
                sims = mi @ mi.T
                bi, bj = np.nonzero(sims > threshold)
                ia, ib = vi[bi], vi[bj]
                keep = ia < ib
                ia, ib = ia[keep], ib[keep]
            else:
                # cross-block: each unordered pair appears once — orient it
                # by id (block number order says nothing about id order)
                mj = _normalize(_stack(gj["embedding"]))
                vj = gj["vec_id"].to_numpy()
                sims = mi @ mj.T
                bi, bj = np.nonzero(sims > threshold)
                ia, ib = (np.minimum(vi[bi], vj[bj]), np.maximum(vi[bi], vj[bj]))
            outs.append(pd.DataFrame({"vec_id_a": ia, "vec_id_b": ib}))
        if not outs:
            return pd.DataFrame({"vec_id_a": pd.Series([], dtype="int64"),
                                 "vec_id_b": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    out = bucketed_group_apply(rep, "pair_key", per_bucket,
                               num_buckets=n_blocks * (n_blocks + 1) // 2)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_id_a": pc.cast(batch["vec_id_a"], pa.int64()),
                         "vec_id_b": pc.cast(batch["vec_id_b"], pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow", batch_size=None)


def _neardup_pairs_broadcast(emb: ray.data.Dataset, threshold: float) -> ray.data.Dataset:
    all_df = emb.to_pandas().sort_values("vec_id")
    am = _normalize(_stack(all_df["embedding"]))
    a_ids = all_df["vec_id"].to_numpy()
    ref = ray.put((a_ids, am))

    def per_batch(batch: pa.Table) -> pa.Table:
        if not len(batch):  # _matrix divides by len(batch)
            return pa.table({"vec_id_a": pa.array([], pa.int64()),
                             "vec_id_b": pa.array([], pa.int64())})
        ids_all, mat_all = ray.get(ref)
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(batch))
        sims = m @ mat_all.T
        bi, bj = np.nonzero(sims > threshold)
        ia, ib = vid[bi], ids_all[bj]
        keep = ia < ib
        return pa.table({
            "vec_id_a": pa.array(ia[keep], pa.int64()),
            "vec_id_b": pa.array(ib[keep], pa.int64()),
        })

    return emb.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def _lsh_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic random hyperplanes (the same matrix every process)."""
    return np.random.RandomState(seed).standard_normal((dim, n_planes))


def _lsh_code_array(m_raw: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """LSH bucket codes from RAW (un-normalized) float64 vectors: bit b =
    dot(v, plane_b) > 0. Norms are positive, so raw-dot signs equal
    normalized-dot signs — and raw dots are the form the SQL oracle can
    reproduce exactly (list_dot_product over DOUBLE[]).

    Known float channel (deliberate): numpy's blocked matmul and DuckDB's
    sequential list_dot_product can disagree by ~1 ulp per sum, so a dot
    whose true value is within ~1e-15 relative of ZERO could flip the bit
    across engines. P(|dot| that small) is ~1e-15 per (vector, plane) on
    real-valued data — negligible at any corpus size we run, and verified
    hash-identical at sf0.001/0.01/0.1. This is the documented exception
    to the 'never compare cross-engine float sums' oracle rule: only the
    SIGN is compared, never the sum itself."""
    n_planes = planes.shape[1]
    return (m_raw @ planes > 0).astype(np.int64) @ (1 << np.arange(n_planes))


def lsh_codes(sf_dir: str, n_planes: int = 6, seed: int = 42) -> ray.data.Dataset:
    """Deterministic LSH bucket code for EVERY vector — the pinnable half of
    lsh_ann_topk (same planes, same code function), hash-matched by an
    oracle whose plane literals are baked into the SQL. Output: vec_id,
    code."""
    emb = read_embeddings(sf_dir)
    dim = len(emb.limit(1).to_pandas()["embedding"].iloc[0])
    planes_ref = ray.put(_lsh_planes(dim, n_planes, seed))

    def per_batch(batch: pa.Table) -> pa.Table:
        if not len(batch):  # _matrix divides by len(batch)
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "code": pa.array([], pa.int64())})
        pl = ray.get(planes_ref)
        codes = _lsh_code_array(_matrix(batch), pl)
        return pa.table({
            "vec_id": pc.cast(batch["vec_id"], pa.int64()),
            "code": pa.array(codes, pa.int64()),
        })

    return emb.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def ivf_assignments(sf_dir: str, n_queries: int = 4,
                    n_centroids: int = 8) -> ray.data.Dataset:
    """Pinnable IVF assignment: centroids are the normalized embeddings of
    vec_id in [n_queries, n_queries + n_centroids) — no Lloyd iterations —
    so the distributed assignment machinery of ivf_ann_topk (broadcast
    centroid matrix, per-batch argmax cosine, ties to the smallest centroid
    id) gets an exact SQL oracle; the Lloyd trainer itself keeps its recall
    pytest. Output: vec_id, centroid_id for every corpus vector.

    Same documented float channel as _lsh_code_array: the engine computes
    normalize-then-dot, the oracle dot/(|a||b|) — the ARGMAX could differ
    only if two centroids' cosines agree to ~1e-15, negligible on
    real-valued data (ties at exact equality break to min cid on both
    sides)."""
    emb = read_embeddings(sf_dir)
    c_df = emb.filter(expr=f"vec_id < {n_queries + n_centroids}").to_pandas()
    c_df = c_df[c_df["vec_id"] >= n_queries].sort_values("vec_id")
    cm = _normalize(_stack(c_df["embedding"]))
    ref = ray.put((c_df["vec_id"].to_numpy(), cm))

    def per_batch(batch: pa.Table) -> pa.Table:
        cids, cmat = ray.get(ref)
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mask = vid >= n_queries
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "centroid_id": pa.array([], pa.int64())})
        m = _normalize(_matrix(batch)[mask])
        # argmax returns the FIRST max; cids ascend, so exact ties go to
        # the smallest centroid id — the oracle's (cos DESC, cid ASC) rank
        a = np.argmax(m @ cmat.T, axis=1)
        return pa.table({
            "vec_id": pa.array(vid[mask], pa.int64()),
            "centroid_id": pa.array(cids[a], pa.int64()),
        })

    return emb.map_batches(per_batch, batch_format="pyarrow", batch_size=None)


def lsh_ann_topk(sf_dir: str, n_queries: int = 4, k: int = 10,
                 n_planes: int = 6, seed: int = 42) -> ray.data.Dataset:
    """LSH-bucketed approximate top-k: random-hyperplane codes (seeded,
    deterministic) bucket the corpus; each query searches only its bucket
    plus hamming-1 neighbor buckets. The composition is deterministic given
    the baked planes, so it has an EXACT SQL oracle (``SQL_LSH_ANN``):
    candidates = codes within hamming distance 1 of the query code
    (``bit_count(xor(...)) <= 1`` over the same plane literals the
    ``lsh_codes`` oracle bakes in), ranked (cos DESC, vec_id ASC)."""
    emb = read_embeddings(sf_dir)
    q_df = emb.filter(expr=f"vec_id < {n_queries}").to_pandas().sort_values("vec_id")
    dim = len(q_df["embedding"].iloc[0])
    planes = _lsh_planes(dim, n_planes, seed)
    q_raw = _stack(q_df["embedding"])
    qm = _normalize(q_raw)
    q_codes = _lsh_code_array(q_raw, planes)  # shared path with lsh_codes
    # target codes per query: own bucket + hamming-1 neighbors
    targets = [ {int(c)} | {int(c) ^ (1 << b) for b in range(n_planes)}
                for c in q_codes ]
    q_ref = ray.put((q_df["vec_id"].to_numpy(), qm, targets, planes))

    def partial(batch: pa.Table) -> pa.Table:
        ids, qmat, tgt, pl = ray.get(q_ref)
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mask = vid >= n_queries
        if not mask.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        m_raw = _matrix(batch)[mask]
        m = _normalize(m_raw)
        vid = vid[mask]
        codes = _lsh_code_array(m_raw, pl)
        rows = []
        for qi in range(qmat.shape[0]):
            cand = np.isin(codes, list(tgt[qi]))
            if not cand.any():
                continue
            sims = qmat[qi] @ m[cand].T
            cv = vid[cand]
            rows.extend((int(ids[qi]), int(cv[j]), float(sims[j]))
                        for j in _topk_idx(sims, cv, k))
        out = pd.DataFrame(rows, columns=["query_id", "vec_id", "cos"])
        from dug_ray.shuffle import typed_table
        return typed_table(out, query_id=pa.int64(), vec_id=pa.int64(),
                           cos=pa.float64())

    partials = emb.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _finalize_topk(partials, k)


def ivf_ann_topk(sf_dir: str, n_queries: int = 4, k: int = 10,
                 n_centroids: int = 8, nprobe: int = 2, iters: int = 3,
                 train_sample: int = 4096) -> ray.data.Dataset:
    """IVF approximate top-k: deterministic Lloyd-iterated centroids
    partition the corpus; each query probes only its ``nprobe`` nearest
    centroid buckets. The scale path alternative to lsh_ann_topk: centroids
    are trained on a BOUNDED deterministic sample (``limit(train_sample)``,
    file order — never the full corpus on the driver), broadcast once, and
    assignment happens per streamed batch. Engine-only (approximate;
    rows-only driver check + recall test)."""
    emb = read_embeddings(sf_dir)
    # small sides on the driver: the query matrix and a bounded train sample
    q_df = emb.filter(expr=f"vec_id < {n_queries}").to_pandas().sort_values("vec_id")
    qm = _normalize(_stack(q_df["embedding"]))
    q_ids = q_df["vec_id"].to_numpy()
    tr = emb.limit(train_sample).to_pandas()
    tr = tr[tr["vec_id"] >= n_queries].sort_values("vec_id")
    cm = _normalize(_stack(tr["embedding"]))

    # deterministic k-means over the sample: seeds = its first n_centroids
    cents = cm[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(cm @ cents.T, axis=1)
        for c in range(n_centroids):
            sel = cm[assign == c]
            if len(sel):
                cents[c] = sel.mean(axis=0)
        cents = _normalize(cents)
    ref = ray.put((cents, q_ids, qm))

    def partial(batch: pa.Table) -> pa.Table:
        cc, qids, qmat = ray.get(ref)
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mask = vid >= n_queries
        if not mask.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        mm = _normalize(_matrix(batch)[mask])
        vv = vid[mask]
        a = np.argmax(mm @ cc.T, axis=1)
        rows = []
        for qi in range(qmat.shape[0]):
            probe = np.argsort(-(qmat[qi] @ cc.T))[:nprobe]
            cand = np.isin(a, probe)
            if not cand.any():
                continue
            sims = qmat[qi] @ mm[cand].T
            cv = vv[cand]
            rows.extend((int(qids[qi]), int(cv[j]), float(sims[j]))
                        for j in _topk_idx(sims, cv, k))
        out = pd.DataFrame(rows, columns=["query_id", "vec_id", "cos"])
        from dug_ray.shuffle import typed_table
        return typed_table(out, query_id=pa.int64(), vec_id=pa.int64(),
                           cos=pa.float64())

    partials = emb.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _finalize_topk(partials, k)


def ivf_ann_topk_pinned(sf_dir: str, n_queries: int = 4, k: int = 10,
                        n_centroids: int = 8, nprobe: int = 2) -> ray.data.Dataset:
    """IVF approximate top-k with PINNED seed centroids (the normalized
    embeddings of vec_id in [n_queries, n_queries + n_centroids), no Lloyd
    iterations — the same centroid set ``ivf_assignments`` pins): each
    query probes its ``nprobe`` nearest centroid buckets (cos DESC, cid ASC)
    and candidates are the vectors ASSIGNED (argmax cosine, ties to the
    smallest cid) to a probed bucket, ranked (cos DESC, vec_id ASC).

    Deterministic end to end, so it composes the two already-pinned halves
    (``ivf_assign`` membership + the ``ann_topk`` rank expression) into an
    exact SQL oracle (``SQL_IVF_ANN``). The Lloyd-trained variant
    ``ivf_ann_topk`` stays as the self-tuning scale path with its recall
    pytest. Output: query_id, vec_id, rank."""
    emb = read_embeddings(sf_dir)
    both = emb.filter(expr=f"vec_id < {n_queries + n_centroids}").to_pandas()
    q_df = both[both["vec_id"] < n_queries].sort_values("vec_id")
    c_df = both[both["vec_id"] >= n_queries].sort_values("vec_id")
    qm = _normalize(_stack(q_df["embedding"]))
    cm = _normalize(_stack(c_df["embedding"]))
    q_ids = q_df["vec_id"].to_numpy()
    c_ids = c_df["vec_id"].to_numpy()
    # probe set per query: nprobe nearest centroids, ties to smaller cid
    # (lexsort = the oracle's (cos DESC, cid ASC) rank; c_ids ascend)
    qc = qm @ cm.T  # (q, c)
    probes = [c_ids[np.lexsort((c_ids, -qc[qi]))[:nprobe]]
              for qi in range(len(q_ids))]
    ref = ray.put((q_ids, qm, c_ids, cm, probes))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, cids, cmat, prb = ray.get(ref)
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mask = vid >= n_queries
        if not mask.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        mm = _normalize(_matrix(batch)[mask])
        vv = vid[mask]
        # argmax returns the FIRST max; cids ascend -> exact ties go to the
        # smallest centroid id, matching the oracle's (cos DESC, cid) rank
        assigned = cids[np.argmax(mm @ cmat.T, axis=1)]
        rows = []
        for qi in range(qmat.shape[0]):
            cand = np.isin(assigned, prb[qi])
            if not cand.any():
                continue
            sims = qmat[qi] @ mm[cand].T
            cv = vv[cand]
            rows.extend((int(qids[qi]), int(cv[j]), float(sims[j]))
                        for j in _topk_idx(sims, cv, k))
        out = pd.DataFrame(rows, columns=["query_id", "vec_id", "cos"])
        from dug_ray.shuffle import typed_table
        return typed_table(out, query_id=pa.int64(), vec_id=pa.int64(),
                           cos=pa.float64())

    partials = emb.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _finalize_topk(partials, k)


def kmeans_update(sf_dir: str, n_queries: int = 4, n_centroids: int = 8,
                  num_buckets: int = 8) -> ray.data.Dataset:
    """One exact Lloyd UPDATE step over the pinned seed centroids: assign
    every corpus vector (vec_id >= n_queries) to its argmax-cosine centroid
    (identical semantics to ``ivf_assignments`` — first max, so exact ties
    go to the smallest centroid id), then reduce the per-centroid
    coordinate sums the new centroids would be computed from.

    Output: (centroid_id, dim, q_sum, n_members) — one row per centroid
    per 1-based dimension.  Coordinates are quantized ``floor(v * 1e6)``
    int64 BEFORE summing, so the reduction is exact integer arithmetic and
    hash-pins against DuckDB (float32 -> float64 is exact on both engines,
    and the scaled floor is the same IEEE op; the float mean itself is
    q_sum / (1e6 * n_members) downstream).  The scale shape is the usual
    combiner: each batch scatter-adds into an (n_centroids x dim) int64
    array at C speed and emits at most n_centroids*dim partial rows, so
    the exchange carries partials, never vectors."""
    from dug_ray.shuffle import bucketed_group_apply, typed_table

    emb = read_embeddings(sf_dir)
    c_df = emb.filter(expr=f"vec_id < {n_queries + n_centroids}").to_pandas()
    c_df = c_df[c_df["vec_id"] >= n_queries].sort_values("vec_id")
    cm = _normalize(_stack(c_df["embedding"]))
    ref = ray.put((c_df["vec_id"].to_numpy(), cm))

    def partial(batch: pa.Table) -> pa.Table:
        cids, cmat = ray.get(ref)
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        mask = vid >= n_queries
        empty = pa.table({"centroid_id": pa.array([], pa.int64()),
                          "dim": pa.array([], pa.int64()),
                          "q_sum": pa.array([], pa.int64()),
                          "n_members": pa.array([], pa.int64())})
        if not mask.any():
            return empty
        raw = _matrix(batch)[mask]
        a = np.argmax(_normalize(raw) @ cmat.T, axis=1)
        q = np.floor(raw * 1e6).astype(np.int64)
        uniq, inv = np.unique(a, return_inverse=True)
        sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, q)                 # vectorized scatter-add
        counts = np.bincount(inv).astype(np.int64)
        n_u, dim = sums.shape
        return pa.table({
            "centroid_id": pa.array(np.repeat(cids[uniq], dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                    n_u), pa.int64()),
            "q_sum": pa.array(sums.ravel(), pa.int64()),
            "n_members": pa.array(np.repeat(counts, dim), pa.int64()),
        })

    partials = emb.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["centroid_id", "dim"], as_index=False).agg(
            q_sum=("q_sum", "sum"), n_members=("n_members", "sum"))

    out = bucketed_group_apply(partials, "centroid_id", merge, num_buckets)
    return out.map_batches(
        lambda t: typed_table(t.to_pandas(), centroid_id=pa.int64(),
                              dim=pa.int64(), q_sum=pa.int64(),
                              n_members=pa.int64()),
        batch_format="pyarrow", batch_size=None)


def kmeans_lloyd(sf_dir: str, rounds: int = 3, n_queries: int = 4,
                 n_centroids: int = 8,
                 num_buckets: int = 8) -> ray.data.Dataset:
    """FULL iterative Lloyd loop (``rounds`` assign+update cycles) over
    the pinned seed centroids — the iterative companion to the single
    ``kmeans_update`` step.  Exactness discipline per round:

    * assignment = argmax cosine, exact ties to the smallest centroid id
      (ivf_assign semantics, same well-separated-ranking robustness);
    * member coordinate sums are quantized ``floor(v*1e6)`` int64
      (exact reduction);
    * the NEXT round's centroid coordinate is the TRUNCATED integer
      division ``q_sum / n`` in micro-units (SQL ``//`` truncates toward
      zero; the engine sign-splits to match), cast to float once — so
      both engines enter every round with bit-identical centroids;
    * an empty cluster keeps its previous centroid.

    Output: the FINAL round's ``(centroid_id, dim, q_sum, n_members)``.

    Scale shape: one combiner pass over the corpus per round (per-batch
    scatter-add into an (k x dim) int64 grid, partials-only exchange);
    the centroid state between rounds is a k x dim micro-int matrix —
    driver-held and re-broadcast via ray.put each round, never
    data-sized."""
    from dug_ray.shuffle import bucketed_group_apply, typed_table

    emb = read_embeddings(sf_dir).filter(
        expr=f"vec_id >= {n_queries}").materialize()
    c_df = emb.filter(
        expr=f"vec_id < {n_queries + n_centroids}").to_pandas()
    c_df = c_df.sort_values("vec_id")
    cids = c_df["vec_id"].to_numpy()
    # centroid state in micro-units so every round starts from the same
    # integers on both engines
    cmic = np.floor(_stack(c_df["embedding"]).astype("float64")
                    * 1e6).astype("int64")
    # round 1 must rank against the RAW stored centroids (the oracle's
    # c0 is the embedding itself, not its quantization)
    cmat = _normalize(_stack(c_df["embedding"]))

    merged = None
    for _ in range(rounds):
        ref = ray.put(cmat)

        def partial(batch: pa.Table) -> pa.Table:
            cm = ray.get(ref)
            raw = _matrix(batch)
            a = np.argmax(_normalize(raw) @ cm.T, axis=1)
            q = np.floor(raw.astype("float64") * 1e6).astype(np.int64)
            uniq, inv = np.unique(a, return_inverse=True)
            sums = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
            np.add.at(sums, inv, q)
            counts = np.bincount(inv).astype(np.int64)
            n_u, dim = sums.shape
            return pa.table({
                "centroid_id": pa.array(np.repeat(cids[uniq], dim),
                                        pa.int64()),
                "dim": pa.array(np.tile(
                    np.arange(1, dim + 1, dtype=np.int64), n_u),
                    pa.int64()),
                "q_sum": pa.array(sums.ravel(), pa.int64()),
                "n_members": pa.array(np.repeat(counts, dim),
                                      pa.int64())})

        partials = emb.map_batches(partial, batch_format="pyarrow",
                                   batch_size=None)

        def merge(df: pd.DataFrame) -> pa.Table:
            g = df.groupby(["centroid_id", "dim"], as_index=False).agg(
                q_sum=("q_sum", "sum"), n_members=("n_members", "sum"))
            return typed_table(g, centroid_id=pa.int64(), dim=pa.int64(),
                               q_sum=pa.int64(), n_members=pa.int64())

        out = bucketed_group_apply(partials, "centroid_id", merge,
                                   num_buckets).materialize()
        merged = out
        # next-round centroids: truncated micro division, empties carry
        mdf = out.to_pandas()
        new_mic = cmic.copy()
        ci = {int(c): i for i, c in enumerate(cids)}
        qs = mdf["q_sum"].to_numpy()
        ns = mdf["n_members"].to_numpy()
        tr = np.where(qs >= 0, qs // ns, -((-qs) // ns))
        new_mic[[ci[int(c)] for c in mdf["centroid_id"]],
                mdf["dim"].to_numpy() - 1] = tr
        cmic = new_mic
        cmat = _normalize(cmic.astype("float64") / 1e6)

    return merged
