"""Round-5 session-24: partition digests (Merkle leaves)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data


def test_partition_digest_is_order_pinned_and_partitioned():
    from dug_ray.shuffle import bucketed_group_apply, typed_table
    import dug_ray.queries as q
    # drive the same digest shape directly over a synthetic triple table
    rows = [("A:2", "p", "o1"), ("A:1", "p", "o2"), ("B:9", "q", "o3"),
            ("A:1", "p", "o1")]
    df = pd.DataFrame(rows, columns=["subj", "pred", "obj"])

    import pyarrow.compute as pc

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part", pc.utf8_slice_codeunits(batch["subj"], 0, 1))

    def digest(g: pd.DataFrame) -> pa.Table:
        out = []
        for p, gg in g.groupby("part", sort=False):
            gg = gg.sort_values(["subj", "pred", "obj"], kind="mergesort")
            canon = (gg["subj"] + "\x1f" + gg["pred"] + "\x1f"
                     + gg["obj"]).str.cat(sep="\x1e")
            out.append((p, len(gg), hashlib.md5(canon.encode())
                        .hexdigest()))
        res = pd.DataFrame(out, columns=["part", "n_rows", "digest"])
        return typed_table(res, part=pa.string(), n_rows=pa.int64(),
                           digest=pa.string())

    def run(parts):
        ds = ray.data.from_pandas(df).repartition(parts)
        tagged = ds.map_batches(add_part, batch_format="pyarrow",
                                batch_size=None)
        return (bucketed_group_apply(tagged, "part", digest, 4)
                .to_pandas().set_index("part").sort_index())

    r1, r3 = run(1), run(3)
    pd.testing.assert_frame_equal(r1, r3)  # block-split invariant
    assert r1.loc["A", "n_rows"] == 3 and r1.loc["B", "n_rows"] == 1
    # hand-computed leaf digest for partition A (sorted rows)
    canon = "\x1e".join(["A:1\x1fp\x1fo1", "A:1\x1fp\x1fo2",
                         "A:2\x1fp\x1fo1"])
    assert r1.loc["A", "digest"] == hashlib.md5(canon.encode()).hexdigest()
