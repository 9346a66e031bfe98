"""TOPMed CSV source tests (S8): real tab-delimited file through
ray.data.read_csv, exact-count + field contracts in the style of the
reference integration tests (``test_parsers.py:68-75``: 62 rows -> 62
elements)."""

import os

import pandas as pd

from dug_ray.sources.csv_source import CSV_COLUMNS, csv_elements, read_variables_csv


def make_csv(tmp_path, n=7) -> str:
    rows = []
    for i in range(n):
        rows.append({
            "tag_pk": i % 3,
            "tag_title": f"tag {i % 3}",
            "variable_phv": f"phv{i:08d}.v1",
            "variable_full_accession": f"phv{i:08d}.v1.p1",
            "dataset_full_accession": f"pht{i:06d}.v1.p1",
            "study_full_accession": "phs000001.v1.p1",
            "study_name": "Test Study",
            "study_phs": "phs000001",
            "study_version": "v1",
            "created": "2020-01-01", "modified": "2020-06-01",
            "variable_name": f"VAR_{i}",
            "variable_description": f"Merge Rate Of Subject {i}",
        })
    path = str(tmp_path / "variables.csv")
    pd.DataFrame(rows)[CSV_COLUMNS].to_csv(path, sep="\t", index=False)
    return path


def test_csv_elements_exact(tmp_path):
    path = make_csv(tmp_path, n=7)
    out = csv_elements(read_variables_csv(path)).to_pandas()
    assert len(out) == 7
    r = out[out["element_id"] == "phv00000003.v1.p1"].iloc[0]
    assert r["element_name"] == "VAR_3"
    assert r["element_desc"] == "merge rate of subject 3"  # lowercased
    assert r["data_type"] == "topmed"
    assert r["collection_id"] == "phs000001.v1.p1"
    assert r["element_action"] == (
        "https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/variable.cgi"
        "?study_id=phs000001.v1.p1&phv=00000003")  # prefix/version stripped, zeros kept
    assert r["tag_pk"] == 0


def test_csv_elements_feed_ner(tmp_path):
    """CSV-sourced elements flow through the same NER stage ('merge' hits)."""
    from dug_ray.stages.annotate import DictionaryNER
    import pyarrow as pa
    path = make_csv(tmp_path, n=4)
    els = csv_elements(read_variables_csv(path)).to_pandas()
    batch = pa.table({
        "element_id": els["element_id"], "doc_id": els["element_id"],
        "collection_id": els["collection_id"],
        "span_offset": pa.array([0] * len(els), pa.int32()),
        "chunk_idx": pa.array([0] * len(els), pa.int32()),
        "element_desc": els["element_desc"],
    })
    hits = DictionaryNER()(batch)
    assert hits.num_rows == 4  # one 'merge' mention per row
    assert set(hits.column("curie").to_pylist()) == {"MESH:D001"}


def test_uri_loader_dispatch(tmp_path, sf_smoke):
    """S2/S3 loader dispatch: file:// equals a plain local read; pre-staged
    http content reads without a fetch; unknown schemes and unreachable
    fetches error clearly."""
    import pytest

    from dug_ray.sources.uri_source import read_table_uri, staged_path

    plain = read_table_uri(f"{sf_smoke}/documents.parquet",
                           columns=["doc_id"]).count()
    via_file = read_table_uri(f"file://{sf_smoke}/documents.parquet",
                              columns=["doc_id"]).count()
    assert plain == via_file == 500

    # pre-staged http:// path (the reference's netloc/path staging layout)
    uri = "http://example.org/data/docs.parquet"
    target = staged_path(str(tmp_path), uri)
    assert target == str(tmp_path / "example.org" / "data" / "docs.parquet")
    import shutil
    os.makedirs(os.path.dirname(target), exist_ok=True)
    shutil.copy(f"{sf_smoke}/documents.parquet", target)
    assert read_table_uri(uri, storage_dir=str(tmp_path)).count() == 500

    with pytest.raises(ValueError, match="Cannot find loader"):
        read_table_uri("ftp://host/x.parquet")

    # UN-staged http in a network-less environment: the honest gate fires
    # (clear error naming the pre-stage path), and no torn .tmp is left
    with pytest.raises(NotImplementedError, match="pre-stage"):
        read_table_uri("http://example.org/data/other.parquet",
                       storage_dir=str(tmp_path))
    other = staged_path(str(tmp_path), "http://example.org/data/other.parquet")
    assert not os.path.exists(other) and not os.path.exists(other + ".tmp")

    # legacy-layout fallback is OPT-IN: by default a query-string URI must
    # NOT silently serve the bare-path file (the collision the .q<hash>
    # suffix prevents — offline, the un-staged suffixed path errors);
    # with allow_legacy_staged=True the pre-suffix cache is served
    quri = "http://example.org/data/docs.parquet?v=2"
    assert staged_path(str(tmp_path), quri) != target  # suffixed today
    with pytest.raises(NotImplementedError, match="pre-stage"):
        read_table_uri(quri, storage_dir=str(tmp_path))
    assert read_table_uri(quri, storage_dir=str(tmp_path),
                          allow_legacy_staged=True).count() == 500
