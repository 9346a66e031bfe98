"""JSON-lines render/parse codec — the newline-delimited-JSON loader path.

The reference's loaders hand parsers whole-file payloads (filesystem
loader: src/dug/core/loaders/filesystem_loader.py; the RADx parser then
consumes per-record JSON).  This module is the engine's JSONL codec as a
pair of inverse batch transforms: ``render_jsonl`` serializes each row to
one canonical JSON line (sorted keys, no whitespace), ``parse_jsonl``
decodes lines back to typed columns against a DECLARED schema — never
inferred from the data, so an empty or malformed shard cannot silently
change the pipeline's dtype contract.

Scale shape: both directions are per-batch map transforms (no exchange);
the per-record ``json.dumps``/``loads`` is the codec itself — the same
per-record cost any JSONL reader pays — and stays inside the worker, so
throughput scales with the actor pool like every other map stage.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data

# declared payload schema: column -> (arrow type, python caster)
DOC_SCHEMA: dict[str, pa.DataType] = {
    "doc_id": pa.int64(),
    "text": pa.string(),
    "lang": pa.string(),
    "source": pa.string(),
    "n_chars": pa.int64(),
}


def render_jsonl(docs: ray.data.Dataset,
                 columns: list[str] | None = None) -> ray.data.Dataset:
    """One canonical JSON line per row: ``(line: string)``."""
    cols = columns or list(DOC_SCHEMA)

    def per_batch(batch: pa.Table) -> pa.Table:
        rows = batch.select(cols).to_pylist()
        lines = [json.dumps(r, sort_keys=True, separators=(",", ":"))
                 for r in rows]
        return pa.table({"line": pa.array(lines, pa.string())})

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            batch_size=None)


def parse_jsonl(lines: ray.data.Dataset,
                schema: dict[str, pa.DataType] | None = None
                ) -> ray.data.Dataset:
    """Decode ``(line)`` rows into the declared column schema.  Missing
    keys become nulls; extra keys are ignored (the loader contract:
    payloads may carry more than the pipeline consumes)."""
    sch = schema or DOC_SCHEMA

    def per_batch(batch: pa.Table) -> pa.Table:
        recs = [json.loads(s) for s in batch["line"].to_pylist()]
        return pa.table({
            c: pa.array([r.get(c) for r in recs], t)
            for c, t in sch.items()})

    return lines.map_batches(per_batch, batch_format="pyarrow",
                             batch_size=None)
