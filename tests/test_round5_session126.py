"""Round-5 session-126: TwoNN intrinsic dimension, JL distortion,
1-NN LOO accuracy — mirrors and invariants on sf0.001."""

from __future__ import annotations


def test_twonn_id_sanity():
    import dug_ray.queries as q
    out = q.QUERIES["twonn_id"]("/root/testdata/sf0.001") \
        .to_pandas().iloc[0]
    assert int(out["n_sample"]) > 0
    assert 0 < int(out["n_used"]) <= int(out["n_sample"])
    # intrinsic dimension of a 64-dim cloud: positive, <= ~ambient
    assert 0 < int(out["id_milli"]) < 200_000


def test_jl_distortion_sanity():
    import dug_ray.queries as q
    out = q.QUERIES["jl_distortion"]("/root/testdata/sf0.001") \
        .to_pandas().iloc[0]
    assert int(out["n_pairs"]) > 0
    # ratios concentrate around 1000 (the JL expectation)
    assert 0 < int(out["p50_milli"]) < 5000
    assert int(out["p50_milli"]) <= int(out["p90_milli"])


def test_knn_loo_mirror():
    import dug_ray.queries as q
    from dug_ray.queries import _embed_sample
    out = q.QUERIES["knn_loo_accuracy"]("/root/testdata/sf0.001") \
        .to_pandas().iloc[0]
    ids, labels, mat = _embed_sample("/root/testdata/sf0.001")
    n = len(ids)
    lab = dict(zip(ids, labels))
    correct = 0
    for i in range(n):
        best = None
        for j in range(n):
            if j == i:
                continue
            d2 = sum((mat[i][t] - mat[j][t]) ** 2
                     for t in range(64))
            if best is None or (d2, ids[j]) < best:
                best = (d2, ids[j])
        if lab[best[1]] == labels[i]:
            correct += 1
    assert (int(out["n_sample"]), int(out["n_correct"])) \
        == (n, correct)
    assert int(out["acc_ppm"]) == (1_000_000 * correct) // n
