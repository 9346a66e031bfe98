"""Real-format dbGaP data-dictionary XML ingestion.

The engine's canonical input is the driver's span table (BASELINE.json
``input_hint``), but a user of the reference holds actual dbGaP
``<data_table>`` XML files. This module closes that gap with two stages:

- ``parse_dbgap_xml`` — the real ingest operator: a batch transform over a
  *file table* (path, xml payload, optional GapExchange sibling payload)
  that parses each payload with ``xml.etree.ElementTree`` and emits one
  element row per ``<variable>``, with the reference's exact semantics
  (reference: src/dug/core/parsers/dbgap_parser.py:44-84 — study_id /
  participant_set attributes :52-54, GapExchange-first study-name
  resolution :57-63 with the filename-regex fallback :16-23 and the
  GapExchange skip :46-49, per-variable id/name/lowercased-description
  :66-72, study/variable action links via utils.get_dbgap_study_link /
  get_dbgap_var_link :75-79).  The reference resolves the GapExchange
  sibling by scanning the data dictionary's parent DIRECTORY
  (dbgap_parser.py:25-38); the dataset-world analogue carries the sibling
  payload as a COLUMN of the file row — at 10^12-file scale a directory
  scan per file is a metadata stampede, while a payload column rides the
  same block.

- ``render_dbgap_xml`` — the deterministic small-scale fixture: documents
  table -> file table, one data-dictionary XML per document (variables =
  the doc's 8-token text chunks, the same windows ``io.spanify`` emits) and
  one GapExchange sibling for every even doc_id.  Pure function of each
  row, so the DuckDB oracle reproduces the parsed output from the raw
  columns (render -> parse round-trips exactly).

The per-payload ``ET.fromstring`` loop is inherent to XML (each payload is
one parse tree); the stage is still a batch transform — one Python call per
FILE, not per variable, and file payloads are the unit of parallelism.
"""

from __future__ import annotations

import re
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd
import pyarrow as pa
import ray.data

from dug_ray.shuffle import typed_table

#: filename -> study name (reference dbgap_parser.py:19 — same pattern)
STUDY_NAME_RE = re.compile(
    r".*/*phs[0-9]+\.v[0-9]+\.pht[0-9]+\.v[0-9]+\.(.+)\.data_dict.*")

DBGAP_STUDY_URL = "https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/study.cgi"
DBGAP_VAR_URL = "https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/variable.cgi"

FILE_SCHEMA = dict(path=pa.string(), xml=pa.string(),
                   gap_exchange_xml=pa.string())

ELEMENT_SCHEMA = dict(element_id=pa.string(), element_name=pa.string(),
                      element_desc=pa.string(), ml_ready_desc=pa.string(),
                      data_type=pa.string(), collection_id=pa.string(),
                      collection_name=pa.string(),
                      element_action=pa.string(),
                      collection_action=pa.string())


def parse_study_name_from_filename(filename: str) -> str | None:
    """Study name from the data-dict filename (dbgap_parser.py:16-23)."""
    m = STUDY_NAME_RE.match(filename)
    return m.group(1) if m is not None else None


def parse_study_name_from_gap_exchange(payload: str) -> str | None:
    """StudyNameEntrez from a GapExchange payload (dbgap_parser.py:25-38,
    minus the directory scan — the sibling payload arrives as a column)."""
    root = ET.fromstring(payload)
    node = root.find("./Studies/Study/Configuration/StudyNameEntrez")
    return None if node is None else node.text


def get_dbgap_study_link(study_id: str) -> str:
    return f"{DBGAP_STUDY_URL}?study_id={study_id}"


def get_dbgap_var_link(study_id: str, variable_id: str) -> str:
    return f"{DBGAP_VAR_URL}?study_id={study_id}&phv={variable_id}"


def _parse_file_batch(batch: pa.Table, data_type: str) -> pa.Table:
    rows: list[tuple] = []
    paths = batch["path"].to_pylist()
    xmls = batch["xml"].to_pylist()
    siblings = (batch["gap_exchange_xml"].to_pylist()
                if "gap_exchange_xml" in batch.column_names
                else [None] * len(batch))
    for path, payload, sibling in zip(paths, xmls, siblings):
        if "GapExchange" in str(path).split("/")[-1]:
            continue  # dbgap_parser.py:46-49 — not a data dictionary
        root = ET.fromstring(payload)
        study_id = root.attrib["study_id"]
        participant_set = root.get("participant_set", "0")
        study_name = (parse_study_name_from_gap_exchange(sibling)
                      if sibling is not None else None)
        if study_name is None:
            study_name = parse_study_name_from_filename(str(path))
        if study_name is None:
            raise IOError(  # dbgap_parser.py:60-63
                f"Unable to parse DbGaP study name from data dictionary: "
                f"{path}!")
        collection_id = f"{study_id}.p{participant_set}"
        collection_action = get_dbgap_study_link(collection_id)
        for variable in root.iter("variable"):
            elem_id = f"{variable.attrib['id']}.p{participant_set}"
            desc = variable.find("description").text.lower()
            action = ""
            if "phv" in elem_id:  # dbgap_parser.py:77-79
                action = get_dbgap_var_link(
                    collection_id,
                    elem_id.split(".")[0].split("phv")[1])
            rows.append((elem_id, variable.find("name").text, desc, desc,
                         data_type, collection_id, study_name, action,
                         collection_action))
    df = pd.DataFrame(rows, columns=list(ELEMENT_SCHEMA))
    return typed_table(df, **ELEMENT_SCHEMA)


def parse_dbgap_xml(files: ray.data.Dataset,
                    data_type: str = "dbgap") -> ray.data.Dataset:
    """File table (path, xml, gap_exchange_xml?) -> elements Dataset.

    ``data_type`` selects the parser brand, the only thing the reference's
    16 DbGaPParser subclasses override (dbgap_parser.py:87-161)."""
    from dug_ray.stages.parse import PARSER_BRANDS
    if data_type not in PARSER_BRANDS:
        raise ValueError(f"unknown parser brand {data_type!r}")
    return files.map_batches(
        lambda b: _parse_file_batch(b, data_type),
        batch_format="pyarrow", batch_size=None)


def _study_num(source: str) -> str:
    """src{N} -> zero-padded 6-digit study number (fixture convention)."""
    return "".join(ch for ch in source if ch.isdigit()).zfill(6)


def _render_batch(batch: pa.Table) -> pa.Table:
    rows: list[tuple] = []
    for doc_id, text, source in zip(batch["doc_id"].to_pylist(),
                                    batch["text"].to_pylist(),
                                    batch["source"].to_pylist()):
        snum = _study_num(source)
        study_id = f"phs{snum}"
        # participant_set OMITTED for doc_id % 3 != 0 — exercises the
        # attrib default ('0') branch of the parser
        pset_attr = ' participant_set="1"' if doc_id % 3 == 0 else ""
        pset = "1" if doc_id % 3 == 0 else "0"
        toks = text.split(" ")
        variables = []
        for chunk in range(-(-len(toks) // 8)):
            # a vx-prefixed id every 5th chunk exercises the no-phv
            # (no variable action) branch
            pfx = "vx" if chunk % 5 == 4 else "phv"
            variables.append(
                f'<variable id="{pfx}{doc_id}_{chunk}">'
                f"<name>var_{doc_id}_{chunk}</name>"
                f"<description>{escape(' '.join(toks[chunk*8:chunk*8+8]))}"
                f"</description></variable>")
        xml = (f'<data_table study_id="{study_id}"{pset_attr} '
               f'id="pht{doc_id}">' + "".join(variables) + "</data_table>")
        path = (f"dbgap/{source}/{study_id}.v1.pht{doc_id}.v1."
                f"study_{source}.data_dict.xml")
        if doc_id % 2 == 0:
            # even docs get a GapExchange sibling (the study-name source
            # that wins over the filename regex) AND the GapExchange file
            # itself as a row (the parser must skip it)
            ge = ("<GapExchange><Studies><Study><Configuration>"
                  f"<StudyNameEntrez>Study {escape(source)} Entrez"
                  "</StudyNameEntrez></Configuration></Study></Studies>"
                  "</GapExchange>")
            rows.append((path, xml, ge))
            rows.append((f"dbgap/{source}/GapExchange_{study_id}.xml",
                         ge, None))
        else:
            rows.append((path, xml, None))
    df = pd.DataFrame(rows, columns=list(FILE_SCHEMA))
    return typed_table(df, **FILE_SCHEMA)


def render_dbgap_xml(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Documents -> deterministic dbGaP XML file table (small-scale fixture;
    pure function of each row so the SQL oracle can reproduce the parse)."""
    return docs.map_batches(_render_batch, batch_format="pyarrow",
                            batch_size=None)
