"""Resumable end-to-end runner: per-input-shard checkpoints + per-output-
partition manifest.

The reference resumes by probing its crawlspace files
(``/root/reference/src/dug/core/concept_expander.py:29-33``). Here the run
is split into the two natural fragment granularities:

- **stage 1 (embarrassingly parallel)**: documents are sharded by
  ``doc_id % num_shards`` (the stand-in for Lance fragment ids at corpus
  scale); each shard runs the full parse -> NER -> link -> triple-combiner
  pipeline and atomically writes ``stage1/shard-{s}.parquet`` + a manifest
  entry. A killed run recomputes only shards missing from the manifest —
  completed fragments are never reread or recomputed (north-rule resume).
- **stage 2**: ``materialize_graph`` over the checkpointed stage-1 partials
  — itself resumable per output bucket partition via its own manifest.

Shard size should amortize per-execution overhead (at 10^12 docs a shard is
a Lance fragment of millions of rows; here 4-16 shards of the test corpus).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dug_ray.io import spanify
from dug_ray.stages.expand import triples_partial
from dug_ray.stages.materialize import materialize_graph, read_graph
from dug_ray.stages.parse import parse_elements
from dug_ray.state.manifest import PartitionManifest, atomic_write_parquet


def _shard_docs(sf_dir: str, shard: int, num_shards: int) -> ray.data.Dataset:
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang", "source"])

    def keep(b: pa.Table, s=shard, n=num_shards) -> pa.Table:
        # doc_id % n == s (pyarrow 16 has no modulo kernel)
        mod = pc.subtract(b["doc_id"], pc.multiply(pc.divide(b["doc_id"], n), n))
        return b.filter(pc.equal(mod, s))

    return docs.map_batches(keep, batch_format="pyarrow", batch_size=None)


def _shard_triples(sf_dir: str, shard: int, num_shards: int) -> ray.data.Dataset:
    from dug_ray.stages.annotate import ner_batch
    from dug_ray.stages.link import link_batch
    docs = spanify(_shard_docs(sf_dir, shard, num_shards))
    linked = (parse_elements(docs)
              .map_batches(ner_batch, batch_format="pyarrow", batch_size=None)
              .map_batches(link_batch, batch_format="pyarrow", batch_size=None))
    return triples_partial(linked)


def run_resumable(sf_dir: str, out_dir: str, num_shards: int = 8,
                  stop_after_shards: int | None = None) -> str:
    """Run the full KG pipeline with two-level resume.

    ``stop_after_shards`` simulates a crash: process that many pending
    stage-1 shards, then raise (used by the kill-resume test; a real crash
    at ANY point leaves only completed, atomically-renamed artifacts)."""
    stage1_dir = os.path.join(out_dir, "stage1")
    manifest = PartitionManifest(stage1_dir)
    done = manifest.completed_buckets()
    pending = [s for s in range(num_shards) if s not in done]

    for i, s in enumerate(pending):
        if stop_after_shards is not None and i >= stop_after_shards:
            raise RuntimeError(f"simulated crash after {i} shards")
        table = pa.concat_tables(
            _shard_triples(sf_dir, s, num_shards)
            .iter_batches(batch_size=None, batch_format="pyarrow"),
            promote_options="default")
        path = os.path.join(stage1_dir, f"shard-{s:05d}.parquet")
        fp = atomic_write_parquet(table, path)
        manifest.mark_done(s, table.num_rows, path, fp)

    triples = ray.data.read_parquet(
        [os.path.join(stage1_dir, f"shard-{s:05d}.parquet") for s in range(num_shards)])
    materialize_graph(triples, out_dir, dedup=True)
    return out_dir


def output_triples(out_dir: str) -> ray.data.Dataset:
    return read_graph(out_dir)
