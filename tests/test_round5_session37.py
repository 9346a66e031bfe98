"""Round-5 session-37: weighted (multiset) Jaccard between sources and
the Kaplan-Meier survival ledger — hand-computed value pins."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import dug_ray.queries as q


def _write_docs(d, rows):
    df = pd.DataFrame(rows, columns=["source", "text"])
    df["doc_id"] = range(len(df))
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "documents.parquet"))


def _write_events(d, rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["event_id"] = range(len(df))
    df["event_type"] = "view"
    df["value"] = 1.0
    df["props"] = ""
    df["ts"] = pd.to_datetime(df["ts"])
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "events.parquet"))


def test_weighted_jaccard_multiset_minmax():
    # src0 counts {a:2, b:1}; src1 counts {a:1, b:2, c:1}
    # sum_min = min(2,1)+min(1,2)+min(0,1) = 2
    # sum_max = max(2,1)+max(1,2)+max(0,1) = 5 -> wj_ppm = 400000
    rows = [("src0", "a a b"),
            ("src1", "a b b c"),
            ("other", "a a a a")]        # filtered out (not a JS source)
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["weighted_jaccard"](d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["source_a"], r["source_b"]) == ("src0", "src1")
    assert int(r["sum_min"]) == 2
    assert int(r["sum_max"]) == 5
    assert int(r["wj_ppm"]) == 400_000


def test_km_survival_product_limit_ledger():
    # u1: days 0..10 -> t=10, l=10 >= 8 -> censored
    # u2: days 0..5  -> t=5, death
    # u3: days 9..10 -> t=1, l=10 -> censored
    # u4: days 0..4  -> t=4, death
    rows = [(1, "2024-01-01"), (1, "2024-01-11"),
            (2, "2024-01-01"), (2, "2024-01-06"),
            (3, "2024-01-10"), (3, "2024-01-11"),
            (4, "2024-01-01"), (4, "2024-01-05")]
    with tempfile.TemporaryDirectory() as d:
        _write_events(d, rows)
        out = q.QUERIES["km_survival"](d)
    df = out.to_pandas().sort_values("t").reset_index(drop=True)
    assert df["t"].tolist() == [1, 4, 5, 10]
    assert df["n_at_risk"].tolist() == [4, 3, 2, 1]
    assert df["deaths"].tolist() == [0, 1, 1, 0]
    assert df["censored"].tolist() == [1, 0, 0, 1]
    t4 = math.floor(math.log(2 / 3) * 1_000_000)
    t5 = math.floor(math.log(1 / 2) * 1_000_000)
    assert df["log_km_micro"].tolist() == [0, t4, t4 + t5, t4 + t5]


def test_apsp_centrality_chain_pins_and_gate_equality():
    import ray.data

    from dug_ray.stages.graph import apsp_centrality

    # chain a-b-c-d-e-f with the 4-hop cap binding (f is 5 hops from a)
    edges = ray.data.from_items(
        [{"subj": a, "obj": b} for a, b in
         [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]])
    driver = apsp_centrality(edges).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    dist = apsp_centrality(edges, max_driver_edges=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(driver, dist)  # gate-forced equality
    a = driver.set_index("node").loc["a"]
    assert (a["reach"], a["ecc"], a["sum_dist"]) == (4, 4, 10)
    assert a["harmonic_micro"] == 1_000_000 + 500_000 + 333_333 + 250_000
    c = driver.set_index("node").loc["c"]
    # c: b,d at 1; a,e at 2; f at 3 -> reach 5, ecc 3, sum 1+1+2+2+3
    assert (c["reach"], c["ecc"], c["sum_dist"]) == (5, 3, 9)


def test_markov_stationary_periodic_and_truncation():
    # periodic 2-cycle: masses swap exactly, stay 500000/500000
    rows = [(1, "2024-01-01 00:00:00", "A"),
            (1, "2024-01-01 00:01:00", "B"),
            (1, "2024-01-01 00:02:00", "A"),
            (1, "2024-01-01 00:03:00", "B"),
            (1, "2024-01-01 00:04:00", "A")]
    with tempfile.TemporaryDirectory() as d:
        _write_typed_events(d, rows)
        out = q.QUERIES["markov_stationary"](d).to_pandas()
    got = out.set_index("state")["mass_micro"].to_dict()
    assert got == {"A": 500_000, "B": 500_000}

    # asymmetric A,A,B,A: transitions A->A, A->B, B->A; true stationary
    # (2/3, 1/3); pin the 10-step truncated-integer iterate exactly
    rows = [(1, "2024-01-01 00:00:00", "A"),
            (1, "2024-01-01 00:01:00", "A"),
            (1, "2024-01-01 00:02:00", "B"),
            (1, "2024-01-01 00:03:00", "A")]
    with tempfile.TemporaryDirectory() as d:
        _write_typed_events(d, rows)
        out = q.QUERIES["markov_stationary"](d).to_pandas()
    got = out.set_index("state")["mass_micro"].to_dict()
    pi = {"A": 500_000, "B": 500_000}
    for _ in range(10):
        new = {}
        for s, t, n, rn in [("A", "A", 1, 2), ("A", "B", 1, 2),
                            ("B", "A", 1, 1)]:
            if s in pi:
                new[t] = new.get(t, 0) + (pi[s] * n) // rn
        pi = new
    assert got == pi
    assert abs(got["A"] - 666_667) < 2_000 and abs(got["B"] - 333_333) < 2_000


def _write_typed_events(d, rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["event_id"] = range(len(df))
    df["value"] = 1.0
    df["props"] = ""
    df["ts"] = pd.to_datetime(df["ts"])
    pq.write_table(pa.Table.from_pandas(df),
                   os.path.join(d, "events.parquet"))


def test_ngram_novelty_stale_grams_pinned():
    # doc0: grams {a b c d e, b c d e f} both first-seen -> novelty 1e6
    # doc1: "a b c d e" stale (doc0), "b c d e x" new -> 500000
    # doc2: 3 tokens, no 5-grams -> absent
    rows = [("src0", "a b c d e f"),
            ("src0", "a b c d e x"),
            ("src0", "a b c")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["ngram_novelty"](d).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_grams"].tolist() == [2, 2]
    assert out["n_stale"].tolist() == [0, 1]
    assert out["novelty_ppm"].tolist() == [1_000_000, 500_000]


def test_kruskal_wallis_midranks_exact():
    # en lengths [1,2], fr [2,3]: doubled midranks 2,5,5,8 ->
    # rs2 en=7 fr=13; terms 3e6*49//40=3675000, 3e6*169//40=12675000;
    # h = 16350000 - 15000000 = 1350000 (true H = 1.35)
    df = pd.DataFrame({"doc_id": range(4),
                       "text": ["x", "xy", "ab", "abc"],
                       "source": "src0",
                       "lang": ["en", "en", "fr", "fr"],
                       "n_chars": [1, 2, 2, 3]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "documents.parquet"))
        out = q.QUERIES["kruskal_wallis"](d).to_pandas()
    got = out.set_index("lang")
    assert got.loc["en", "rank_sum_x2"] == 7
    assert got.loc["fr", "rank_sum_x2"] == 13
    assert set(out["h_micro"]) == {1_350_000}


def test_daily_peaks_strict_local_maxima():
    # day counts: d0=1, d1=3, d2=2, d3=2 -> only d1 is a strict peak
    rows = []
    for day, n in [(0, 1), (1, 3), (2, 2), (3, 2)]:
        for i in range(n):
            rows.append((1, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=day, minutes=i)))
    with tempfile.TemporaryDirectory() as d:
        _write_events(d, rows)
        out = q.QUERIES["daily_peaks"](d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_events"], r["prev_n"], r["next_n"]) == (3, 1, 2)


def test_rake_keywords_phrase_degree_scores():
    # "big sort the big sort merge": phrases [big sort], [big sort merge]
    # freq big=2 sort=2 merge=1; deg big=5 sort=5 merge=3
    # scores: merge 3000, big 2500, sort 2500
    rows = [("src0", "big sort the big sort merge")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["rake_keywords"](d).to_pandas()
    assert out["word"].tolist() == ["merge", "big", "sort"]
    assert out["score_milli"].tolist() == [3000, 2500, 2500]
    assert out.set_index("word")["deg"].to_dict() == {
        "merge": 3, "big": 5, "sort": 5}


def test_wilcoxon_signed_doubled_midranks():
    # 2024-01-01 Mon .. 2024-01-06 Sat; diffs: u1 +2, u2 -1, u3 0
    # (dropped), u4 +3 -> |d| 1,2,3 distinct -> r2 2,4,6;
    # W+ = 4+6 = 10, W- = 2, n_pairs = 3
    mon, sat = "2024-01-01", "2024-01-06"
    rows = []
    for u, wd, we in [(1, 3, 1), (2, 1, 2), (3, 2, 2), (4, 4, 1)]:
        for i in range(wd):
            rows.append((u, pd.Timestamp(mon) + pd.Timedelta(minutes=i)))
        for i in range(we):
            rows.append((u, pd.Timestamp(sat) + pd.Timedelta(minutes=i)))
    with tempfile.TemporaryDirectory() as d:
        _write_events(d, rows)
        out = q.QUERIES["wilcoxon_signed"](d).to_pandas()
    r = out.iloc[0]
    assert (r["n_pairs"], r["w_plus_x2"], r["w_minus_x2"]) == (3, 10, 2)


def test_holt_trend_truncated_negative_step():
    # counts [10,50,10,5,0,0]: hand-stepped integers; the last step's
    # trend numerator is -1600 -> TRUNCATED -1 (floor would be -2)
    rows = []
    for day, n in enumerate([10, 50, 10, 5, 0, 0]):
        for i in range(n):
            rows.append((1, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=day, minutes=i)))
        if n == 0:  # a day with zero events is absent; keep 1 marker
            rows.append((1, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(days=day)))
    with tempfile.TemporaryDirectory() as d:
        _write_events(d, rows)
        out = q.QUERIES["holt_trend"](d).to_pandas() \
            .sort_values("day").reset_index(drop=True)
    # zero-days became 1-event days (events must exist to observe a day)
    # recompute by hand with y = [10,50,10,5,1,1]:
    # d0 (10,10,0); d1 s=(15000+7000)//1000=22 b=(200*12)//1000=2
    # d2 s=(3000+700*24)//1000=19 b=(-600+1600)//1000=1
    # d3 s=(1500+700*20)//1000=15 b=(-800+800)//1000=0
    # d4 s=(300+700*15)//1000=10 b=(200*(10-15)+0)//1000=trunc(-1000/1000)=-1
    # d5 s=(300+700*9)//1000=6 b=(200*(6-10)+800*(-1))//1000=trunc(-1.6)=-1
    assert out["level_s"].tolist() == [10, 22, 19, 15, 10, 6]
    assert out["trend_b"].tolist() == [0, 2, 1, 0, -1, -1]


def test_gram_power_iter_golden_ratio_direction():
    # vectors (1,0) and (1,1): gram [[2e6,1e6],[1e6,1e6]] whose dominant
    # eigenvector ratio is (sqrt(5)-1)/2; pin the exact 8-step integer
    # iterate via the same truncated arithmetic
    emb = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [1.0, 1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int32())})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
        out = q.QUERIES["gram_power_iter"](d).to_pandas() \
            .sort_values("dim").reset_index(drop=True)
    gm = {(1, 1): 2_000_000, (1, 2): 1_000_000,
          (2, 1): 1_000_000, (2, 2): 1_000_000}
    v = {1: 1_000_000, 2: 1_000_000}
    for _ in range(8):
        w = {i: sum(gm[(i, j)] * v[j] for j in (1, 2)) for i in (1, 2)}
        m = max(abs(x) for x in w.values())
        v = {i: (w[i] * 1_000_000) // m for i in (1, 2)}
    assert out["v_micro"].tolist() == [v[1], v[2]]
    assert v[1] == 1_000_000 and abs(v[2] - 618_034) < 200


def test_daily_dispersion_exact_ratio():
    # day counts [1,3]: disp = 1e6*(2*10-16)//(2*4) = 500000
    rows = [(1, pd.Timestamp("2024-01-01"))]
    rows += [(1, pd.Timestamp("2024-01-02") + pd.Timedelta(minutes=i))
             for i in range(3)]
    with tempfile.TemporaryDirectory() as d:
        _write_events(d, rows)
        out = q.QUERIES["daily_dispersion"](d).to_pandas()
    r = out.iloc[0]
    assert (r["n_days"], r["sum_y"], r["sum_y2"],
            r["dispersion_ppm"]) == (2, 4, 10, 500_000)


def test_class_weights_inverse_frequency():
    emb = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([[0.0]] * 4, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0, 1], pa.int32())})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(emb, os.path.join(d, "embeddings.parquet"))
        out = q.QUERIES["class_weights"](d).to_pandas()
    got = out.set_index("label")["weight_micro"].to_dict()
    assert got == {0: 666_666, 1: 2_000_000}


def test_zone_map_prune_skip_decision():
    df = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 1500],
        "o_custkey": 1, "o_orderstatus": "O",
        "o_totalprice": [100.0, 120.0, 90.0, 70000.0],
        "o_orderdate": pd.to_datetime("1996-01-01"),
        "o_orderpriority": "3-MEDIUM"})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "orders.parquet"))
        out = q.QUERIES["zone_map_prune"](d).to_pandas() \
            .sort_values("block_id").reset_index(drop=True)
    b0 = out.iloc[0]
    assert (b0["n_rows"], b0["min_cents"], b0["max_cents"],
            b0["prunable"]) == (3, 9_000, 12_000, 1)
    b1 = out.iloc[1]
    assert (b1["n_rows"], b1["prunable"]) == (1, 0)


def test_kmv_union_exact_under_k():
    # under k=64 distinct values the sketch is exact: per-source counts
    # and the merged union row are plain distinct counts
    rows = [("src0", "a b c"), ("src1", "b c d e")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["kmv_union"](d).to_pandas()
    got = out.set_index("scope")["est_distinct"].to_dict()
    assert got == {"src0": 3, "src1": 4, "ALL": 5}
    assert out.set_index("scope")["k"].to_dict() == {
        "src0": 3, "src1": 4, "ALL": 5}


def test_calibration_bins_structure():
    rows = [("src0", "the quick brown fox jumps over the lazy dog"),
            ("src0", "completely different words entirely here now")]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)  # lang column is 'en' for all fixture docs
        out = q.QUERIES["calibration_bins"](d).to_pandas()
    assert int(out["n_docs"].sum()) == 2
    assert ((out["n_correct"] >= 0) & (out["n_correct"]
                                       <= out["n_docs"])).all()
    assert (out["acc_ppm"] == 1_000_000 * out["n_correct"]
            // out["n_docs"]).all()


def test_er_clusters_transitive_min_label():
    # block 'widget': 1-2 dist 1, 2-4 dist 1, 3 far; block 'gizmo': 5
    df = pd.DataFrame({
        "p_partkey": [1, 2, 3, 4, 5],
        "p_name": ["widget alpha", "widget alphb", "widget gamma!!",
                   "widget alphc", "gizmo x"],
        "p_brand": "Brand#1", "p_type": "t", "p_size": 1,
        "p_retailprice": 1.0})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df),
                       os.path.join(d, "part.parquet"))
        out = q.QUERIES["er_clusters"](d).to_pandas()
    got = out.set_index("p_partkey")["cluster_id"].to_dict()
    assert got == {1: 1, 2: 1, 3: 3, 4: 1, 5: 5}


def test_winnowing_rightmost_tie_rule():
    # 7 identical tokens -> 5 identical-hash grams, 2 windows; the
    # rightmost-min rule selects gram positions 3 and 4 -> 2 selected
    # fingerprints over 1 distinct hash
    rows = [("src0", "a a a a a a a"),
            ("src0", "w x")]                 # < 3 tokens -> absent
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["winnowing"](d).to_pandas()
    assert out["doc_id"].tolist() == [0]
    r = out.iloc[0]
    assert (r["n_grams"], r["n_selected"], r["n_fp_hashes"]) == (5, 2, 1)


def test_weighted_reservoir_aes_ranking():
    import hashlib

    texts = ["x" * n for n in (5, 50, 500, 17, 170)]
    rows = [("src0", t) for t in texts]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(d, rows)
        out = q.QUERIES["weighted_reservoir"](d).to_pandas()
    exp = []
    for did, t in enumerate(texts):
        u = int(hashlib.md5(str(did).encode()).hexdigest()[:15], 16)
        li = math.floor(math.log(u / 1152921504606846976.0) * 1_000_000)
        num = li * 1_000_000
        w = len(t)
        score = num // w if num >= 0 else -((-num) // w)
        exp.append((did, u, w, score))
    exp.sort(key=lambda r: (-r[3], r[0]))
    assert list(map(tuple, out[["doc_id", "u60", "weight",
                                "score"]].itertuples(index=False))) == exp
