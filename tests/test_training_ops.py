"""Training-data operator tests: dedup family, similarity, text stats,
multimodal plumbing. Small in-memory fixtures + pure-Python oracles
(the SQL-oracle equivalence is covered by selfcheck/driver; these tests
pin semantics the SQL can't express — stub behavior, approximations)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data


def docs_ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_exact_dedup_groups():
    from dug_ray.stages.dedup import exact_dedup
    ds = docs_ds([
        {"doc_id": 3, "text": "a b c"},
        {"doc_id": 1, "text": "a b c"},
        {"doc_id": 2, "text": "x y z"},
    ])
    out = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["n_copies"]) == [2, 1]

    # null texts form ONE group with a null content_hash (the oracle's
    # GROUP BY text keeps a NULL group; dropna=True would silently lose
    # these docs from the engine side)
    ds = docs_ds([
        {"doc_id": 5, "text": None},
        {"doc_id": 4, "text": None},
        {"doc_id": 6, "text": "k"},
    ])
    out = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [4, 6]
    assert list(out["n_copies"]) == [2, 1]
    assert out["content_hash"].isna().tolist() == [True, False]


def test_minhash_identical_docs_collide_all_bands():
    from dug_ray.stages.dedup import LSH_BANDS, minhash_lsh_pairs
    ds = docs_ds([
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 3, "text": "completely different words entirely here now ok yes"},
    ])
    out = minhash_lsh_pairs(ds).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["doc_id_a"], out.iloc[0]["doc_id_b"]) == (1, 2)
    assert out.iloc[0]["n_bands"] == LSH_BANDS


def test_simhash_identical_equal():
    from dug_ray.stages.dedup import simhash_fingerprints
    ds = docs_ds([
        {"doc_id": 1, "text": "alpha beta gamma delta"},
        {"doc_id": 2, "text": "alpha beta gamma delta"},
        {"doc_id": 3, "text": "zeta eta theta iota"},
    ])
    out = simhash_fingerprints(ds).to_pandas().set_index("doc_id")["simhash"]
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert 0 <= out[3] < 2 ** 16


def test_ngram_jaccard_exact_values():
    from dug_ray.stages.dedup import ngram_jaccard_pairs
    # doc1/doc2 share the 4-word prefix -> 2 common 3-shingles
    ds = docs_ds([
        {"doc_id": 1, "text": "a b c d e"},
        {"doc_id": 2, "text": "a b c d x"},
        {"doc_id": 3, "text": "p q r s t"},
    ])
    out = ngram_jaccard_pairs(ds).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["doc_id_a"], r["doc_id_b"], r["inter"]) == (1, 2, 2)
    assert r["jaccard"] == pytest.approx(2 / 4)


def test_ann_topk_matches_numpy(sf_smoke):
    from dug_ray.stages.similarity import ann_topk
    out = ann_topk(sf_smoke, n_queries=2, k=5).to_pandas()
    emb = pq.read_table(f"{sf_smoke}/embeddings.parquet").to_pandas()
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in (0, 1):
        sims = m[emb["vec_id"] == qid][0] @ m[emb["vec_id"] >= 2].T
        ids = emb[emb["vec_id"] >= 2]["vec_id"].to_numpy()
        order = sorted(zip(-sims, ids))[:5]
        want = [int(i) for _, i in order]
        got = list(out[out["query_id"] == qid].sort_values("rank")["vec_id"])
        assert got == want


def test_lsh_ann_recall(sf_smoke):
    """LSH ANN must recall a decent fraction of the true top-k."""
    from dug_ray.stages.similarity import ann_topk, lsh_ann_topk
    exact = ann_topk(sf_smoke).to_pandas()
    approx = lsh_ann_topk(sf_smoke).to_pandas()
    inter = len(set(map(tuple, exact[["query_id", "vec_id"]].values))
                & set(map(tuple, approx[["query_id", "vec_id"]].values)))
    assert inter >= 0.2 * len(exact)  # bucketed search: partial recall by design


def test_media_decode_stub(sf_smoke):
    from dug_ray.io import read_interleaved
    from dug_ray.stages.multimodal import MediaDecoder, decode_media
    import pyarrow as pa
    with pytest.raises(NotImplementedError):
        MediaDecoder(fake=False)(pa.table({
            "doc_id": ["1"], "offset": [2], "media_ref": ["media://1/2"]}))
    out = decode_media(read_interleaved(sf_smoke), fake=True).to_pandas()
    assert len(out) > 0
    assert (out["n_bytes"] == 64).all()
    assert isinstance(out["payload"].iloc[0], bytes)


def test_media_features_match_hashlib(sf_smoke):
    """The vectorized md5 featurizer (sidecar + frombuffer digit decode) is
    bit-identical to the per-row hashlib definition, and empty batches keep
    the typed schema."""
    import hashlib

    import pyarrow as pa

    from dug_ray.io import read_interleaved
    from dug_ray.stages.multimodal import MediaFeatures, media_features
    out = media_features(read_interleaved(sf_smoke)).to_pandas()
    assert len(out) > 0
    sample = out.head(20)
    for _, r in sample.iterrows():
        hx = hashlib.md5(r["media_ref"].encode()).hexdigest()[:MediaFeatures.DIM]
        assert [int(c, 16) for c in hx] == [r[f"f{j}"] for j in range(MediaFeatures.DIM)]
    empty = MediaFeatures()(pa.table({
        "doc_id": pa.array([], pa.string()), "offset": pa.array([], pa.int64()),
        "media_ref": pa.array([], pa.string())}))
    assert empty.num_rows == 0
    assert empty.schema.field("f0").type == pa.int64()


def test_langid_valid(sf_smoke):
    from dug_ray.io import read_documents
    from dug_ray.stages.textstats import langid
    out = langid(read_documents(sf_smoke, columns=["doc_id", "text"])).to_pandas()
    assert len(out) == 500
    assert set(out["pred_lang"]) <= {"en", "fr", "es", "de", "zh"}


def test_events_window_totals(sf_smoke):
    from dug_ray import queries
    out = queries.q_events_window(sf_smoke).to_pandas()
    raw = pq.read_table(f"{sf_smoke}/events.parquet").to_pandas()
    assert out["n_events"].sum() == len(raw)
    assert out["sum_value_milli"].sum() == int((raw["value"] * 1000).round().sum())


def test_ivf_ann_recall(sf_smoke):
    from dug_ray.stages.similarity import ann_topk, ivf_ann_topk
    exact = ann_topk(sf_smoke).to_pandas()
    approx = ivf_ann_topk(sf_smoke).to_pandas()
    inter = len(set(map(tuple, exact[["query_id", "vec_id"]].values))
                & set(map(tuple, approx[["query_id", "vec_id"]].values)))
    assert inter >= 0.3 * len(exact)  # nprobe=2/8 buckets: partial recall by design


def test_sliding_window_totals(sf_smoke):
    """Every event lands in exactly HOUR/HOP windows."""
    import pyarrow.parquet as pq
    from dug_ray import queries
    out = queries.q_events_sliding(sf_smoke).to_pandas()
    raw = pq.read_table(f"{sf_smoke}/events.parquet").to_pandas()
    assert out["n_events"].sum() == 2 * len(raw)


def test_session_window_sanity(sf_smoke):
    import pyarrow.parquet as pq
    from dug_ray import queries
    out = queries.q_events_session(sf_smoke).to_pandas()
    raw = pq.read_table(f"{sf_smoke}/events.parquet").to_pandas()
    assert out["n_events"].sum() == len(raw)
    assert (out["duration_sec"] >= 0).all()
    # sessions are 0-based consecutive per user
    for _, g in out.groupby("user_id"):
        assert sorted(g["session"]) == list(range(len(g)))


def test_hll_accuracy(sf_smoke):
    """HLL estimate within 10% of the exact distinct-token count (only 31
    distinct tokens -> small-range correction path)."""
    import duckdb
    from dug_ray.io import read_documents
    from dug_ray.stages.sketch import hll_distinct_tokens
    est = hll_distinct_tokens(
        read_documents(sf_smoke, columns=["doc_id", "text", "source"]))
    exact = duckdb.sql(
        f"SELECT count(DISTINCT term) FROM (SELECT unnest(string_split(text,' ')) "
        f"AS term FROM read_parquet('{sf_smoke}/documents.parquet'))").fetchone()[0]
    got = float(est["approx_distinct"].iloc[0])
    assert abs(got - exact) / exact < 0.1


def test_typed_table_schema_stability():
    """typed_table keeps empty and populated frames schema-identical (an
    empty object column would otherwise infer Arrow null type and leak
    divergent block schemas into shuffles), and a filtered-to-empty batch
    through a string-column partial keeps its declared schema."""
    import pandas as pd
    import pyarrow as pa

    from dug_ray.shuffle import typed_table
    full = pd.DataFrame({"k": ["a", "b"], "n": [1, 2]})
    t_full = typed_table(full, k=pa.string(), n=pa.int64())
    t_empty = typed_table(full.iloc[0:0], k=pa.string(), n=pa.int64())
    assert t_full.schema == t_empty.schema
    assert t_empty.schema.field("k").type == pa.string()
    # a real partial: exact-dedup combiner on an empty batch
    from dug_ray.stages.dedup import exact_dedup  # noqa: F401 (import path)
    import ray.data
    empty_docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    out = exact_dedup(empty_docs)
    sch = out.schema()
    assert sch is None or "doc_id" in sch.names


def test_hll_null_group_key():
    """Grouped sketches keep null-keyed rows as ONE group (the engine's
    null-key contract) — their tokens must not vanish, and mixed None/str
    keys must not TypeError the merged-state sort (NULLS LAST)."""
    import pandas as pd
    import ray.data
    from dug_ray.stages.sketch import hll_distinct_tokens, hll_register_summary
    docs = ray.data.from_pandas(pd.DataFrame({
        "text": ["a b c", "c d", "e f g h"],
        "lang": ["en", None, "en"]}))
    est = hll_distinct_tokens(docs, by="lang")
    assert list(est["key"]) == ["en", None]  # NULLS LAST
    by_key = dict(zip(est["key"], est["approx_distinct"]))
    assert round(by_key[None]) == 2      # 'c d' survived under the null group
    assert round(by_key["en"]) == 7      # a b c e f g h
    summ = hll_register_summary(docs, by="lang")
    assert dict(zip(summ["key"], summ["n_regs"]))[None] == 2


def test_hash_join_edges():
    """Partitioned hash join: unmatched keys drop, empty side yields empty,
    dtypes survive the typed-null widening."""
    from dug_ray.shuffle import hash_join
    left = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3], "lv": [10.5, 20.5, 30.5]}))
    right = ray.data.from_pandas(pd.DataFrame(
        {"r": [2, 3, 3, 9], "rv": ["a", "b", "c", "d"]}))
    out = hash_join(left, right, "k", "r").to_pandas().sort_values(
        ["k", "rv"]).reset_index(drop=True)
    assert list(out["k"]) == [2, 3, 3]
    assert list(out["rv"]) == ["a", "b", "c"]
    assert out["lv"].dtype == "float64"

    empty = ray.data.from_pandas(pd.DataFrame({"r": pd.Series([], dtype="int64"),
                                               "rv": pd.Series([], dtype="object")}))
    out2 = hash_join(left, empty, "k", "r").to_pandas()
    assert len(out2) == 0


def test_bucket_null_keys_and_join_collision_guard():
    """stable_bucket_array routes null keys to bucket 0 instead of crashing;
    hash_join rejects shared non-key column names up front (they would be
    silently suffixed to _x/_y inside the bucket merge otherwise)."""
    import pyarrow as pa
    import pytest

    from dug_ray.shuffle import bucketed_group_apply, hash_join, stable_bucket_array

    b = stable_bucket_array(pa.array(["x", None, "y", None]), 8)
    assert b[1].as_py() == 0 and b[3].as_py() == 0
    assert stable_bucket_array(pa.array([None, None], pa.string()), 8).to_pylist() == [0, 0]

    ds = ray.data.from_pandas(pd.DataFrame({"k": ["a", None, "a", None],
                                            "v": [1, 2, 3, 4]}))
    out = bucketed_group_apply(
        ds, "k", lambda df: df.groupby("k", as_index=False, dropna=False)
        .agg(s=("v", "sum")), 4).to_pandas()
    got = {(None if pd.isna(r["k"]) else r["k"]): r["s"] for _, r in out.iterrows()}
    assert got == {"a": 4, None: 6}

    left = ray.data.from_pandas(pd.DataFrame({"k": [1], "shared": [1]}))
    right = ray.data.from_pandas(pd.DataFrame({"r": [1], "shared": [2]}))
    with pytest.raises(ValueError, match="disjoint"):
        hash_join(left, right, "k", "r")


def test_connected_components_clusters():
    """Two transitive near-dup chains + a singleton: min-label propagation
    assigns each chain its min doc_id, and the chain is joined through a
    middle doc (a-b and b-c similar, a-c less so) — the transitivity that
    pair lists alone don't give."""
    from dug_ray.stages.cluster import connected_components

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [10, 11, 12, 20, 21, 30],
        "text": [base,                              # 10
                 base + " iota",                    # 11: near-dup of 10
                 base + " iota kappa lam",          # 12: near-dup of 11
                 "one two three four five six",     # 20
                 "one two three four five six",     # 21: exact dup of 20
                 "totally different words here now"],  # 30: singleton
    }))
    want = {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30}
    # both implementations: driver union-find (default) and the
    # distributed min-label loop (forced via max_driver_edges=0)
    for kwargs in ({}, {"max_driver_edges": 0}):
        out = connected_components(docs, **kwargs).to_pandas().sort_values("doc_id")
        assert dict(zip(out["doc_id"], out["cluster_id"])) == want, kwargs


def test_asof_join_tie_and_no_prior():
    """As-of semantics pinned: strictly-before matching on the total
    (sec, event_id) key — an equal-timestamp quote with a LOWER event_id
    matches, with a higher one does not; ticks with no prior quote get -1."""
    from dug_ray.stages.windows import asof_join

    def mk(rows):
        df = pd.DataFrame(rows, columns=["event_id", "user_id", "sec", "value"])
        df["ts"] = pd.Timestamp(0) + pd.to_timedelta(df.pop("sec"), unit="s")
        return ray.data.from_pandas(df)

    ticks = mk([(10, 1, 100, 1.0),   # prior quote at sec 50
                (20, 1, 200, 2.0),   # tie: quote id 19 at sec 200 (< 20) matches
                (30, 2, 100, 3.0)])  # user 2 has no quote
    quotes = mk([(5, 1, 50, 0.5), (19, 1, 200, 0.7), (25, 1, 200, 0.9)])
    out = asof_join(ticks, quotes).to_pandas().sort_values("event_id")
    got = list(zip(out["event_id"], out["quote_event"], out["quote_milli"]))
    assert got == [(10, 5, 500), (20, 19, 700), (30, -1, -1)]


def test_bloom_semi_join_exact_and_selective():
    """Bloom prefilter: no false negatives ever (the exact-join result
    equals a pandas semi-join), and the probe mask keeps all members while
    passing only a tiny false-positive fraction of non-members."""
    import numpy as np

    from dug_ray.stages.bloom import bloom_semi_join, build_bloom, probe_mask

    keys = pd.DataFrame({"k": np.arange(0, 2000, 2), "tag": "m"})   # evens
    big = pd.DataFrame({"b": np.arange(5000), "v": np.arange(5000) * 2})
    out = bloom_semi_join(ray.data.from_pandas(big), "b",
                          ray.data.from_pandas(keys), "k").to_pandas()
    want = big[big["b"].isin(set(keys["k"]))]
    assert sorted(out["b"]) == sorted(want["b"])

    bloom = np.frombuffer(build_bloom(ray.data.from_pandas(keys), "k"),
                          dtype=np.uint8)
    members = probe_mask(keys["k"].to_numpy(), bloom)
    assert members.all()  # zero false negatives
    non = np.arange(1, 200001, 2)  # odds: none are members
    fp = probe_mask(non, bloom).mean()
    assert fp < 0.01


def test_asof_join_large_event_ids_no_key_collision():
    """Regression: event_ids past 1e6 must not bleed into the sec ordering
    (the old composite sec*1e6+event_id key collided here)."""
    from dug_ray.stages.windows import asof_join

    def mk(rows):
        df = pd.DataFrame(rows, columns=["event_id", "user_id", "sec", "value"])
        df["ts"] = pd.Timestamp(0) + pd.to_timedelta(df.pop("sec"), unit="s")
        return ray.data.from_pandas(df)

    # quote 1500001 at sec 10 vs quote 101 at sec 11: sec order must win
    ticks = mk([(0, 1, 12, 1.0)])
    quotes = mk([(1500001, 1, 10, 0.111), (101, 1, 11, 0.222)])
    out = asof_join(ticks, quotes).to_pandas()
    assert list(out["quote_event"]) == [101]
    assert list(out["quote_milli"]) == [222]


def test_md5_int_parity_and_mixture_rows():
    """md5_int must be bit-identical to hashlib (the DuckDB-sidecar
    vectorization can't drift from the oracle), and the row-emitting
    mixture must agree with the count-reporting one."""
    import hashlib

    from dug_ray.stages.sampling import md5_int, mixture_sample, mixture_sample_rows

    ids = np.array([-7, 0, 1, 42, 10**12], dtype=np.int64)
    want = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in ids]
    assert list(md5_int(ids)) == want

    from dug_ray.hashing import md5_hex, md5_uint64
    strs = ["", "a", "hello world", "ünïcødé"]
    assert list(md5_hex(strs)) == [hashlib.md5(s.encode()).hexdigest() for s in strs]
    assert list(md5_hex(strs, 16)) == [hashlib.md5(s.encode()).hexdigest()[:16]
                                       for s in strs]
    u = md5_uint64(strs)
    assert u.dtype == np.uint64 and list(u) == [
        int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") for s in strs]

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "source": ["web", "books", "papers"] * 100,
    }))
    counts = mixture_sample(docs).to_pandas().set_index("source")["n_kept"]
    rows = mixture_sample_rows(docs).to_pandas()
    assert rows.groupby("source").size().reindex(counts.index).fillna(0).astype(int).equals(
        counts.astype(int))
    # kept set is a deterministic subset
    again = mixture_sample_rows(docs).to_pandas()
    assert sorted(rows["doc_id"]) == sorted(again["doc_id"])

    # an explicit weights map threads through both variants: keep-all vs
    # near-none quarters must reorder the per-source kept counts, and the
    # reported weight_quarters must echo the map (fallback for unmapped)
    w = {"web": 4, "books": 1}
    cw = mixture_sample(docs, weights=w).to_pandas().set_index("source")
    rw = mixture_sample_rows(docs, weights=w).to_pandas()
    assert cw.loc["web", "weight_quarters"] == 4
    assert cw.loc["books", "weight_quarters"] == 1
    assert cw.loc["papers", "weight_quarters"] == len("papers") % 3 + 1
    assert cw.loc["web", "n_kept"] > cw.loc["books", "n_kept"]
    assert rw.groupby("source").size().reindex(cw.index).fillna(0).astype(int).equals(
        cw["n_kept"].astype(int))

    # a NULL source follows SQL semantics: its docs are never kept (NULL
    # threshold compares false) but the group IS reported, with a null
    # weight — not a garbage int cast of NaN
    nd = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "source": ["web"] * 10 + [None] * 10}))
    cn = mixture_sample(nd).to_pandas()
    nrow = cn[cn["source"].isna()]
    assert len(nrow) == 1 and int(nrow["n_total"].iloc[0]) == 10
    assert int(nrow["n_kept"].iloc[0]) == 0 and nrow["weight_quarters"].isna().all()
    rn = mixture_sample_rows(nd).to_pandas()
    assert not rn["source"].isna().any()


def test_curated_corpus_composition(sf_smoke):
    """The composed pipeline must equal the conjunction of its component
    operators computed independently — catches composition bugs (wrong
    join side, missed gate) that each component's own oracle can't see."""
    import numpy as np

    from dug_ray import queries as q
    from dug_ray.io import read_documents
    from dug_ray.stages.cluster import connected_components
    from dug_ray.stages.sampling import decontaminate, mixture_sample_rows

    got = set(q.QUERIES["curated_corpus"](sf_smoke).to_pandas()["doc_id"])

    qual = q.QUERIES["quality_filters"](sf_smoke).to_pandas()
    qual_ok = set(qual[qual[["pass_n_tokens", "pass_token_len",
                             "pass_has_stopword", "pass_repetition"]].all(axis=1)]["doc_id"])
    mix = set(mixture_sample_rows(
        read_documents(sf_smoke, columns=["doc_id", "source"])).to_pandas()["doc_id"])
    cc = connected_components(
        read_documents(sf_smoke, columns=["doc_id", "text"])).to_pandas()
    canon = set(cc[cc["doc_id"] == cc["cluster_id"]]["doc_id"])
    contam = set(decontaminate(
        read_documents(sf_smoke, columns=["doc_id", "text"])).to_pandas()["doc_id"])
    docs = read_documents(sf_smoke, columns=["doc_id"]).to_pandas()["doc_id"].to_numpy()
    non_eval = set(docs[docs % 97 != 0])

    want = (qual_ok & mix & canon & non_eval) - contam
    assert got == want and len(got) > 0

    # gate 4's scale path: force the Bloom prefilter + partitioned
    # anti-join (max_broadcast_contam=0) — must be bit-equal to the
    # broadcast path (Bloom has no false negatives; the exact anti-join
    # removes the false positives), same discipline as the CC
    # max_driver_edges=0 fork.
    from dug_ray.queries import q_curated_corpus
    got_bloom = set(q_curated_corpus(
        sf_smoke, max_broadcast_contam=0).to_pandas()["doc_id"])
    assert got_bloom == want


def test_lsh_codes_and_ivf_assign_consistency(sf_smoke):
    """lsh_codes must equal the codes lsh_ann_topk buckets with (shared
    path), and ivf_assign must put every vector in its true nearest seed
    centroid (numpy recompute)."""
    import numpy as np

    from dug_ray.stages.similarity import (_lsh_code_array, _lsh_planes,
                                           _matrix, _normalize,
                                           ivf_assignments, lsh_codes,
                                           read_embeddings)

    emb = read_embeddings(sf_smoke).to_pandas().sort_values("vec_id")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    planes = _lsh_planes(m.shape[1], 6, 42)
    want_codes = dict(zip(emb["vec_id"], _lsh_code_array(m, planes)))
    got_codes = lsh_codes(sf_smoke).to_pandas()
    assert dict(zip(got_codes["vec_id"], got_codes["code"])) == want_codes

    vids = emb["vec_id"].to_numpy()
    cm = _normalize(m[(vids >= 4) & (vids < 12)])
    corpus = vids >= 4
    sims = _normalize(m[corpus]) @ cm.T
    want_assign = dict(zip(vids[corpus], vids[(vids >= 4) & (vids < 12)][np.argmax(sims, axis=1)]))
    got = ivf_assignments(sf_smoke).to_pandas()
    assert dict(zip(got["vec_id"], got["centroid_id"])) == want_assign


def test_media_resize(sf_smoke):
    """Resize dims are aspect-fit integers (never upscale, larger side ==
    224 exactly when resized), and the actor resample stage is decode-gated
    with a working deterministic fake path."""
    import pyarrow as pa
    import pytest

    from dug_ray.io import read_interleaved
    from dug_ray.stages.multimodal import MediaResizer, media_resize
    from dug_ray.queries import q_media_resize

    dims = q_media_resize(sf_smoke).to_pandas()
    assert len(dims) > 0 and dims["resized"].any() and (~dims["resized"]).any()
    r = dims[dims["resized"]]
    assert (np.maximum(r["out_w"], r["out_h"]) == 224).all()
    assert (r["out_w"] <= r["width"]).all() and (r["out_h"] <= r["height"]).all()
    nr = dims[~dims["resized"]]
    assert (nr["out_w"] == nr["width"]).all() and (nr["out_h"] == nr["height"]).all()

    with pytest.raises(NotImplementedError):
        MediaResizer(fake=False)(pa.table({
            "media_ref": ["media://1/2"], "out_w": [10], "out_h": [10]}))
    out = media_resize(read_interleaved(sf_smoke), fake=True).to_pandas()
    assert len(out) == len(dims)
    assert all(isinstance(p, bytes) and len(p) == 32 for p in out["payload"])
    # vectorized stub keeps the original per-row formula
    row = out.iloc[0]
    assert row["payload"] == bytes(
        (len(row["media_ref"]) * 31 + row["out_w"] + row["out_h"] + i) % 256
        for i in range(32))


def test_ppm_codec_roundtrip(sf_smoke):
    """The REAL decode branch: decode_ppm is a spec-conformant P6 parser
    (comments, arbitrary whitespace, bad-magic/maxval rejection), nn_resize
    is integer nearest-neighbor, and the codec='ppm' decoder/resizer emit
    payloads whose bytes round-trip the container exactly."""
    import hashlib

    import pyarrow as pa
    import pytest

    from dug_ray.io import read_interleaved
    from dug_ray.stages.multimodal import (decode_ppm, media_resize,
                                           nn_resize, synth_ppm)

    # hand-built P6 with a comment and multi-whitespace header
    raster = bytes(range(2 * 3 * 3))  # 3 wide, 2 high
    w, h, img = decode_ppm(b"P6 # a comment\n 3\t2 \n255\n" + raster)
    assert (w, h) == (3, 2) and img.shape == (2, 3, 3)
    assert img.tobytes() == raster
    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00")

    # synth -> decode round-trips header and raster
    sp = synth_ppm("media://9/2", 5, 4, seed=7)
    w, h, img = decode_ppm(sp)
    assert (w, h) == (5, 4)
    assert img.tobytes() == bytes((7 + 11 * j) % 256 for j in range(5 * 4 * 3))

    # nearest-neighbor: 1x1 output samples pixel (0,0); identity at same dims
    assert nn_resize(img, 1, 1).tobytes() == img[0, 0].tobytes()
    assert nn_resize(img, 5, 4).tobytes() == img.tobytes()

    # full pipeline: payload bytes and md5 agree with an independent
    # numpy recompute for a sample row
    out = media_resize(read_interleaved(sf_smoke), max_dim=16,
                       codec="ppm").to_pandas()
    assert len(out) > 0
    row = out.iloc[0]
    assert row["n_bytes"] == row["out_w"] * row["out_h"] * 3 == len(row["payload"])
    assert row["payload_md5"] == hashlib.md5(
        row["payload"].hex().encode()).hexdigest()
    _, _, full = decode_ppm(synth_ppm(
        row["media_ref"], row["width"], row["height"],
        int(hashlib.md5(row["media_ref"].encode()).hexdigest()[:2], 16)))
    assert nn_resize(full, row["out_w"], row["out_h"]).tobytes() == row["payload"]

    # the decoder's ppm branch: image spans only, full-raster payloads
    from dug_ray.stages.multimodal import decode_media
    dec = decode_media(read_interleaved(sf_smoke), codec="ppm").to_pandas()
    assert len(dec) == len(out)
    assert (dec["n_bytes"] == dec["width"] * dec["height"] * 3).all()
    assert all(len(p) == n for p, n in zip(dec["payload"], dec["n_bytes"]))


def test_hash_join_large_int64_exact_and_reserved_names():
    """Regression: the typed-null widen used to push int64-with-nulls
    through pandas float64, silently corrupting non-key values >= 2^53;
    defaults-filled widening must round-trip them exactly and keep int64.
    Reserved internal names are rejected up front."""
    from dug_ray.shuffle import hash_join

    big = 2**60 + 1
    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "big_id": [big, 7]}))
    right = ray.data.from_pandas(pd.DataFrame({"r": [1, 2], "rv": ["a", "b"]}))
    out = hash_join(left, right, "k", "r").to_pandas().sort_values("k")
    assert out["big_id"].dtype == "int64"
    assert list(out["big_id"]) == [big, 7]

    bad = ray.data.from_pandas(pd.DataFrame({"k": [1], "_side": ["x"]}))
    with pytest.raises(ValueError, match="reserve"):
        hash_join(bad, right, "k", "r")


def test_materialize_layout_pin_and_fresh_run(tmp_path):
    """Resume across a (num_buckets, salt) change must refuse (stale done
    ids would anti-filter the wrong partitions); a resume=False rerun must
    clear the previous run's part files; an all-empty materialization
    reads back as an empty dataset."""
    from dug_ray.stages.materialize import materialize_graph, read_graph

    triples = ray.data.from_pandas(pd.DataFrame({
        "subj": ["A:1", "B:2"], "pred": ["p", "p"],
        "obj": ["X:1", "X:2"], "obj_name": ["x", "y"], "source_query": ["q", "q"]}))
    out = str(tmp_path / "g")
    materialize_graph(triples, out, num_buckets=4, salt=2)
    assert read_graph(out).count() == 2

    with pytest.raises(ValueError, match="layout mismatch"):
        materialize_graph(triples, out, num_buckets=8, salt=2)

    # fresh (resume=False) rerun with different content replaces the output
    smaller = ray.data.from_pandas(pd.DataFrame({
        "subj": ["C:9"], "pred": ["p"], "obj": ["X:3"],
        "obj_name": ["z"], "source_query": ["q"]}))
    materialize_graph(smaller, out, num_buckets=4, salt=2, resume=False)
    got = read_graph(out).to_pandas()
    assert list(got["subj"]) == ["C:9"]  # no stale rows from run 1

    empty = ray.data.from_pandas(pd.DataFrame({
        "subj": pd.Series([], dtype="object"), "pred": pd.Series([], dtype="object"),
        "obj": pd.Series([], dtype="object"), "obj_name": pd.Series([], dtype="object"),
        "source_query": pd.Series([], dtype="object")}))
    out2 = str(tmp_path / "g2")
    materialize_graph(empty, out2, num_buckets=4, salt=2)
    assert read_graph(out2).count() == 0


def test_bloom_null_key_batch_keeps_members():
    """Regression: a null landing in a probe batch used to flip the numpy
    view to float64, changing every value's hash — members in that batch
    were silently dropped (false negatives). Dictionary-path hashing must
    keep them."""
    import pyarrow as pa

    from dug_ray.stages.bloom import build_bloom, probe_mask

    keys = ray.data.from_pandas(pd.DataFrame({"k": np.arange(0, 1000, 2)}))
    bloom = np.frombuffer(build_bloom(keys, "k"), dtype=np.uint8)
    mask = probe_mask(pa.array([4, None, 500], pa.int64()), bloom)
    assert mask[0] and mask[2]          # real members survive the null
    assert not mask[1]                  # the null itself never matches


def test_regex_scrub_counts_and_redaction():
    from dug_ray.stages.scrub import regex_scrub
    ds = docs_ds([
        {"doc_id": 1, "text": "mail me at bob@example.com or see https://x.io/a now"},
        {"doc_id": 2, "text": "the a dup theatre 12345678 short 123"},
        {"doc_id": 3, "text": "nothing special here"},
    ])
    out = regex_scrub(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_email"]) == [1, 0, 0]
    assert list(out["n_url"]) == [1, 0, 0]
    assert list(out["n_num"]) == [0, 1, 0]   # 123 is below the 7-digit floor
    # doc 1: the URL path "/a" contains a \b-delimited "a" — counts are
    # measured on the ORIGINAL text (before URL redaction), so it counts
    assert list(out["n_stop"]) == [1, 3, 0]  # theatre untouched by \b
    assert out.loc[0, "clean_text"] == "mail me at <EMAIL> or see <URL> now"
    assert out.loc[1, "clean_text"] == "<STOP> <STOP> <STOP> theatre <NUM> short 123"
    assert out.loc[2, "clean_text"] == "nothing special here"
    assert (out["clean_len"] == out["clean_text"].str.len()).all()


def test_bigram_counts_boundaries_and_ties():
    from dug_ray.stages.scrub import bigram_counts
    # "b c" appears twice; doc boundary between docs must NOT form "c b"
    ds = docs_ds([
        {"doc_id": 1, "text": "a b c"},
        {"doc_id": 2, "text": "b c"},
    ])
    out = bigram_counts(ds, k=10).to_pandas()
    got = dict(zip(out["bigram"], out["n"]))
    assert got == {"a b": 1, "b c": 2}
    # ordering: count DESC then bigram ASC
    assert list(out["bigram"]) == ["b c", "a b"]


def test_pack_sequences_prefix_sum_exact():
    from dug_ray.stages.scrub import pack_sequences
    # tokens per doc: 3,4,5,2 -> exclusive cumsum 0,3,7,12; budget 5 ->
    # bins 0,0,1,2 (doc straddling a boundary stays in the bin it starts in)
    rows = [{"doc_id": i, "text": " ".join(["w"] * n)}
            for i, n in enumerate([3, 4, 5, 2])]
    out = (pack_sequences(docs_ds(rows), budget=5, span=2, num_buckets=2)
           .to_pandas().sort_values("bin").reset_index(drop=True))
    assert list(out["bin"]) == [0, 1, 2]
    assert list(out["n_docs"]) == [2, 1, 1]
    assert list(out["tok_total"]) == [7, 5, 2]
    assert list(out["doc_lo"]) == [0, 2, 3]
    assert list(out["doc_hi"]) == [1, 2, 3]


def test_pack_sequences_bin_straddles_range_boundary():
    from dug_ray.stages.scrub import pack_sequences
    # span=1 puts every doc in its own range; with budget=100 all docs land
    # in bin 0, whose partials from different ranges must merge exactly
    rows = [{"doc_id": i, "text": "x y z"} for i in range(6)]
    out = pack_sequences(docs_ds(rows), budget=100, span=1,
                         num_buckets=3).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "n_docs"] == 6
    assert out.loc[0, "tok_total"] == 18
    assert (out.loc[0, "doc_lo"], out.loc[0, "doc_hi"]) == (0, 5)


def test_kmeans_update_matches_numpy(sf_smoke):
    from dug_ray.stages.similarity import kmeans_update
    out = (kmeans_update(sf_smoke).to_pandas()
           .sort_values(["centroid_id", "dim"]).reset_index(drop=True))
    emb = pq.read_table(f"{sf_smoke}/embeddings.parquet").to_pandas()
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    vid = emb["vec_id"].to_numpy()
    cm = m[(vid >= 4) & (vid < 12)]
    cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    members = m[vid >= 4]
    mn = members / np.linalg.norm(members, axis=1, keepdims=True)
    assign = np.argmax(mn @ cm.T, axis=1)
    q = np.floor(members * 1e6).astype(np.int64)
    dim = q.shape[1]
    assert len(out) == 8 * dim
    for c in range(8):
        sel = assign == c
        got = out[out["centroid_id"] == c + 4]
        assert (got["n_members"] == int(sel.sum())).all()
        np.testing.assert_array_equal(
            got.sort_values("dim")["q_sum"].to_numpy(), q[sel].sum(axis=0))


def test_q3_shipping_matches_pandas(sf_smoke):
    from dug_ray.queries import Q3_CUTOFF, q_q3_shipping
    out = q_q3_shipping(sf_smoke).to_pandas()
    cust = pq.read_table(f"{sf_smoke}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{sf_smoke}/orders.parquet").to_pandas()
    li = pq.read_table(f"{sf_smoke}/lineitem.parquet").to_pandas()
    cutoff = pd.Timestamp(Q3_CUTOFF)
    keys = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    o = orders[(orders["o_orderdate"] < cutoff)
               & orders["o_custkey"].isin(keys)].copy()
    # dtype-agnostic epoch seconds (pyarrow hands pandas datetime64[us])
    o["o_sec"] = (o["o_orderdate"] - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
    l = li[li["l_shipdate"] > cutoff].copy()
    l["rev_c"] = ((l["l_extendedprice"] * 100).round().astype("int64")
                  * (10000 - (l["l_discount"] * 10000).round().astype("int64")))
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    g = (j.groupby(["l_orderkey", "o_sec"], as_index=False)
         .agg(revenue_cents=("rev_c", "sum"))
         .sort_values(["revenue_cents", "l_orderkey"],
                      ascending=[False, True]).head(10).reset_index(drop=True))
    g["rank"] = g.index + 1
    pd.testing.assert_frame_equal(
        out.sort_values("rank").reset_index(drop=True)[g.columns].astype("int64"),
        g.astype("int64"))


def test_unigram_logprob_matches_python():
    import math
    from dug_ray.stages.textstats import unigram_logprob
    rows = [{"doc_id": 1, "text": "a a b"},
            {"doc_id": 2, "text": "b c"},
            {"doc_id": 3, "text": "a"}]
    out = (unigram_logprob(docs_ds(rows)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    counts = {"a": 3, "b": 2, "c": 1}
    total = 6
    lp = {t: math.floor(math.log(n / total) * 1e6) for t, n in counts.items()}
    want = [lp["a"] * 2 + lp["b"], lp["b"] + lp["c"], lp["a"]]
    assert list(out["logprob_milli"]) == want
    assert list(out["n_tokens"]) == [3, 2, 1]


def test_ntile_buckets_sql_semantics():
    from dug_ray.queries import q_ntile_buckets
    import tempfile, os
    import pyarrow as pa
    import pyarrow.parquet as pqw
    # n=6 -> tiles sized 2,2,1,1 ; n=2 (< k) -> tiles 1,2 ; ties break by doc_id
    rows = ([{"doc_id": i, "source": "s6", "n_chars": 10} for i in range(6)]
            + [{"doc_id": i, "source": "s2", "n_chars": 5} for i in (7, 8)])
    with tempfile.TemporaryDirectory() as d:
        pqw.write_table(pa.Table.from_pylist(rows), os.path.join(d, "documents.parquet"))
        out = q_ntile_buckets(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out[out["source"] == "s6"]["tile"]) == [1, 1, 2, 2, 3, 4]
    assert list(out[out["source"] == "s2"]["tile"]) == [1, 2]
