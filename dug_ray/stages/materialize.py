"""Graph materialize sink: the sorted, subject-partitioned triple table.

Replaces dug's three Elasticsearch indices (``/root/reference/src/dug/core/
index.py:55-246``, SURVEY.md §2.1 S18) with the north star's serving layer:
a **sorted triple table partitioned by canonical subject**. ``ds.sort('subj')``
is the range-partition shuffle; the write emits one parquet directory per
subject hash bucket so that (a) a reader can prune to a subject's bucket and
(b) a killed run resumes per-bucket (see state/manifest.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def add_subj_bucket(triples: ray.data.Dataset, num_buckets: int = 16) -> ray.data.Dataset:
    """Stable hash bucket of the subject CURIE (not Python hash(): must be
    deterministic across processes for resume)."""

    def _bucket(batch: pa.Table) -> pa.Table:
        import zlib
        import numpy as np
        subs = batch["subj"].to_pylist()
        b = np.fromiter((zlib.crc32(s.encode()) % num_buckets for s in subs),
                        dtype=np.int32, count=len(subs))
        return batch.append_column("subj_bucket", pa.array(b))

    return triples.map_batches(_bucket, batch_format="pyarrow")


def materialize_graph(triples: ray.data.Dataset, out_dir: str,
                      num_buckets: int = 16) -> str:
    """Sort by subj and write hive-partitioned by subject bucket."""
    bucketed = add_subj_bucket(triples, num_buckets)
    bucketed.sort(["subj", "pred", "obj"]).write_parquet(
        out_dir, partition_cols=["subj_bucket"])
    return out_dir
