"""Searchable-dict export: the reference's crawl/index output family.

``dug crawl`` writes ``crawl/element_file.json`` / ``crawl/concept_file.json``
(searchable dicts, ``/root/reference/src/dug/core/crawler.py:65,80,99-103``)
and upserts three Elasticsearch indices (``core/index.py:186-246``). The
engine equivalent: three partitioned parquet datasets with the same logical
schemas —

- ``elements/``  : variables_index analogue (``index.py:118-157``) — one row
  per element with its search terms, concept ids and identifier union;
- ``concepts/``  : concepts_index analogue (``index.py:80-117``) — one row
  per canonical concept;
- ``kg/``        : kg_index analogue (``index.py:224-246``) — one row per
  (concept, query) answer with doc id ``{concept_id}_{answer_id}``.

Everything derives from the already-verified pipelines; writes stream
(``write_parquet``), nothing materializes on the driver.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from dug_ray.pipelines import kg
from dug_ray.stages.canonicalize import build_concepts, element_terms


def _atomic_write(ds: ray.data.Dataset, final: str) -> None:
    """write_parquet into a tmp dir + rename (the cmd_curate/runner
    pattern): a rerun into the same out_dir REPLACES the dataset instead of
    appending uniquely-named part files next to the old ones."""
    import os
    import shutil
    tmp = final.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)


def export_searchable(sf_dir: str, out_dir: str) -> dict[str, int]:
    """Write the three searchable datasets; returns row counts."""
    from dug_ray import queries as q

    # the session cache — q_kg_answers below reads the SAME pinned linked
    # stream instead of re-running parse->NER->link a second time
    linked = kg.linked_mentions_cached(sf_dir)
    # consumed twice (element_terms' take_all + write_parquet): pin once so
    # the canonicalization shuffle doesn't re-execute
    concepts = build_concepts(linked).materialize()

    _atomic_write(element_terms(linked, concepts), f"{out_dir}/elements")
    _atomic_write(concepts, f"{out_dir}/concepts")

    answers = q.q_kg_answers(sf_dir, concepts=concepts)

    def doc_ids(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        doc_id = pc.binary_join_element_wise(
            batch["subj"], batch["answer_id"], "_")
        return batch.append_column("doc_id", doc_id)

    answers = answers.map_batches(doc_ids, batch_format="pyarrow", batch_size=None)
    _atomic_write(answers, f"{out_dir}/kg")

    return {
        "elements": ray.data.read_parquet(f"{out_dir}/elements").count(),
        "concepts": ray.data.read_parquet(f"{out_dir}/concepts").count(),
        "kg": ray.data.read_parquet(f"{out_dir}/kg").count(),
    }
