"""Parse stage: interleaved documents -> elements Dataset.

The Ray-Data re-expression of dug's parser family (SURVEY.md §2.1 S4-S14):
one document row yields N element rows — one per *text* span, the analogue of
one ``<variable>`` entry of a dbGaP data table
(``/root/reference/src/dug/core/parsers/dbgap_parser.py:66-81``). The 16
branded DbGaP subclasses (``dbgap_parser.py:87-161``) differ only in the
``data_type`` string, so the brand is a parameter of the same vectorized
batch function (S5). Link construction mirrors the study/variable URL
builders (``/root/reference/src/dug/utils.py:30-51`` M13); descriptions are
lowercased like ``dbgap_parser.py:69`` (already lowercase in the synthetic
corpus, kept for parity).

Element identity is the composite ``{id}-{collection_id}`` of
``parsers/_base.py:60-61`` — here ``element_id = {doc_id}-s{offset}`` is
already collection-scoped since offsets are per-document.

Everything is pyarrow-vectorized: string concatenation via
``binary_join_element_wise``, the text-span filter via a compute mask; no
Python row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dug_ray.io import MEDIA_EVERY, flatten_spans

#: registry of parser "brands" (S5/S15; pluggy registry parsers/__init__.py:24-53)
PARSER_BRANDS = [
    "dbgap", "anvil", "crdc", "kfdrc", "biolincc", "covid19", "dir", "lungmap",
    "nsrr", "parent", "pcgc", "recover", "topmed", "curesc", "heartfailure",
    "imaging", "reds", "nida", "scicrunch", "sprint", "bacpac", "heal-studies",
    "heal-research", "ctn", "radx",
]


def _concat(*parts) -> pa.Array:
    return pc.binary_join_element_wise(*parts, "")


def elements_from_spans(flat: pa.Table, data_type: str = "dbgap") -> pa.Table:
    """Text spans -> element rows (vectorized)."""
    t = flat.filter(pc.equal(flat["kind"], "text"))
    doc_id = pc.cast(t["doc_id"], pa.string())
    offset_s = pc.cast(t["offset"], pa.string())
    element_id = _concat(doc_id, pa.scalar("-s"), offset_s)
    source = t["source"]
    # text chunk index (see io.py offset arithmetic) -> base token position
    offset = pc.cast(t["offset"], pa.int64())
    chunk_idx = pc.subtract(
        offset, pc.divide(pc.add(offset, 1), MEDIA_EVERY + 1))
    desc = pc.utf8_lower(t["text"])
    return pa.table({
        "element_id": element_id,
        "element_name": _concat(pa.scalar("var_"), doc_id, pa.scalar("_"), offset_s),
        "element_desc": desc,
        # copy of desc used as annotation input (parsers/_base.py:24)
        "ml_ready_desc": desc,
        "data_type": pa.nulls(len(t), pa.string()).fill_null(data_type),
        "collection_id": source,
        "collection_name": _concat(pa.scalar("study "), source),
        "element_action": _concat(
            pa.scalar("https://example.org/study/"), source,
            pa.scalar("/variable/"), element_id),
        "collection_action": _concat(pa.scalar("https://example.org/study/"), source),
        "doc_id": doc_id,
        "lang": t["lang"],
        "span_offset": pc.cast(t["offset"], pa.int32()),
        "chunk_idx": pc.cast(chunk_idx, pa.int32()),
    })


def parse_elements(docs: ray.data.Dataset, data_type: str = "dbgap") -> ray.data.Dataset:
    """Interleaved documents Dataset -> elements Dataset.

    ``data_type`` selects the parser brand (M1 type coercion
    ``crawler.py:54-56`` is the same column overwrite)."""
    if data_type not in PARSER_BRANDS:
        raise ValueError(f"unknown parser brand {data_type!r}")
    flat = flatten_spans(docs)
    return flat.map_batches(
        lambda b: elements_from_spans(b, data_type), batch_format="pyarrow", batch_size=None)
