"""Real-format dbGaP XML ingestion (sources/xml_source.py) — mirrors the
reference's parser integration coverage
(/root/reference/tests/integration/test_parsers.py:6-35): study-name
resolution from the filename (incl. multi-digit versions), from a
GapExchange sibling, and a data-dictionary parse yielding elements."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from dug_ray.sources.xml_source import (parse_dbgap_xml,
                                        parse_study_name_from_filename,
                                        parse_study_name_from_gap_exchange,
                                        render_dbgap_xml)


def test_parse_study_name_from_filename():
    # mirrors test_parsers.py:6-14, including version numbers > 9
    f = "whatever/phs000166.v2.pht000700.v1.CAMP_CData.data_dict_2009_09_03.xml"
    assert parse_study_name_from_filename(f) == "CAMP_CData"
    f = "whatever/phs000166.v23.pht000700.v13.CAMP_CData.data_dict_2009_09_03.xml"
    assert parse_study_name_from_filename(f) == "CAMP_CData"
    assert parse_study_name_from_filename("not/a/dbgap/file.xml") is None


def test_parse_study_name_from_gap_exchange():
    ge = ("<GapExchange><Studies><Study><Configuration>"
          "<StudyNameEntrez>My Long Study Name (ACRO)</StudyNameEntrez>"
          "</Configuration></Study></Studies></GapExchange>")
    assert parse_study_name_from_gap_exchange(ge) == "My Long Study Name (ACRO)"


def _files(rows):
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["path", "xml", "gap_exchange_xml"]))


DD = ('<data_table study_id="phs000166" participant_set="2" id="pht000700">'
      '<variable id="phv0001"><name>AGE</name>'
      "<description>Age At Baseline</description></variable>"
      '<variable id="vx0002"><name>SITE</name>'
      "<description>Clinic Site</description></variable>"
      "</data_table>")


def test_parse_dbgap_xml_semantics():
    path = "d/phs000166.v2.pht000700.v1.CAMP_CData.data_dict.xml"
    out = parse_dbgap_xml(_files([(path, DD, None)])).to_pandas()
    assert len(out) == 2  # test_parsers.py:31-35: elements parsed
    byid = out.set_index("element_id")
    # id suffixed with .p{participant_set}; description LOWERCASED
    age = byid.loc["phv0001.p2"]
    assert age["element_name"] == "AGE"
    assert age["element_desc"] == "age at baseline"
    assert age["collection_id"] == "phs000166.p2"
    assert age["collection_name"] == "CAMP_CData"  # filename fallback
    assert age["element_action"] == (
        "https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/variable.cgi"
        "?study_id=phs000166.p2&phv=0001")
    assert age["collection_action"] == (
        "https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/study.cgi"
        "?study_id=phs000166.p2")
    # non-phv id -> no variable action (dbgap_parser.py:77-79)
    assert byid.loc["vx0002.p2"]["element_action"] == ""


def test_parse_dbgap_xml_gap_exchange_wins_and_skips():
    ge = ("<GapExchange><Studies><Study><Configuration>"
          "<StudyNameEntrez>ECLIPSE-like</StudyNameEntrez>"
          "</Configuration></Study></Studies></GapExchange>")
    path = "d/phs000166.v2.pht000700.v1.CAMP_CData.data_dict.xml"
    out = parse_dbgap_xml(_files([
        (path, DD, ge),                       # sibling beats the filename
        ("d/GapExchange_phs000166.xml", ge, None),  # skipped entirely
    ])).to_pandas()
    assert len(out) == 2
    assert set(out["collection_name"]) == {"ECLIPSE-like"}


def test_parse_dbgap_xml_unnameable_raises():
    out = parse_dbgap_xml(_files([("d/opaque.xml", DD, None)]))
    with pytest.raises(Exception, match="study name"):
        out.to_pandas()  # dbgap_parser.py:60-63 raises IOError


def test_render_parse_roundtrip_counts(sf_smoke):
    """One element per 8-token chunk of every document; GapExchange rows
    contribute none."""
    import duckdb
    from dug_ray.io import read_documents
    docs = read_documents(sf_smoke, columns=["doc_id", "text", "source"])
    out = parse_dbgap_xml(render_dbgap_xml(docs)).to_pandas()
    want = duckdb.sql(
        f"SELECT sum(CAST(ceil(len(string_split(text, ' ')) / 8.0) AS BIGINT)) "
        f"FROM read_parquet('{sf_smoke}/documents.parquet')").fetchone()[0]
    assert len(out) == want
    # every even doc has a GapExchange-sourced name, odd docs the filename
    got_even = out[out["element_id"].str.startswith("phv0_")]
    assert (got_even["collection_name"].str.endswith("Entrez")).all()
