"""TOPMed-style tab-delimited CSV variable source (SURVEY.md §2.1 S8).

The reference's ``topmed_csv_parser`` reads tab-delimited variable rows and
emits elements with dbGaP links (``/root/reference/src/dug/core/parsers/
topmed_csv_parser.py:13-50``); the tag variant joins an adjacent tags JSON
(``topmed_tag_parser.py:15-85``). Ray Data form: ``ray.data.read_csv`` with
a tab ParseOptions + a vectorized projection batch fn. Column layout per
FIXTURES.md §2 (mirrors ``tests/integration/data/test_variables_v2.0.csv``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from pyarrow import csv as pa_csv

CSV_COLUMNS = [
    "tag_pk", "tag_title", "variable_phv", "variable_full_accession",
    "dataset_full_accession", "study_full_accession", "study_name",
    "study_phs", "study_version", "created", "modified",
    "variable_name", "variable_description",
]


def read_variables_csv(path: str) -> ray.data.Dataset:
    """Read a tab-delimited TOPMed variables CSV."""
    return ray.data.read_csv(
        path, parse_options=pa_csv.ParseOptions(delimiter="\t"))


def csv_elements(ds: ray.data.Dataset, data_type: str = "topmed") -> ray.data.Dataset:
    """CSV variable rows -> elements (vectorized projection; dbGaP link
    construction per ``topmed_csv_parser.py`` / ``utils.py:30-51``)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        n = len(batch)
        acc = batch["variable_full_accession"]
        study = batch["study_full_accession"]
        # dbGaP &phv= carries the bare numeric accession: the reference takes
        # id.split('.')[0].split('phv')[1] (topmed_csv_parser.py:44 +
        # utils.py:30-32) — version suffix and 'phv' prefix stripped, leading
        # zeros kept
        phv_num = pc.replace_substring_regex(acc, r"^phv|\..*$", "")
        return pa.table({
            "element_id": acc,
            "element_name": batch["variable_name"],
            "element_desc": pc.utf8_lower(batch["variable_description"]),
            "ml_ready_desc": pc.utf8_lower(batch["variable_description"]),
            "data_type": pa.nulls(n, pa.string()).fill_null(data_type),
            "collection_id": study,
            "collection_name": batch["study_name"],
            "element_action": pc.binary_join_element_wise(
                pa.scalar("https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/variable.cgi?study_id="),
                study, pa.scalar("&phv="), phv_num, ""),
            "collection_action": pc.binary_join_element_wise(
                pa.scalar("https://www.ncbi.nlm.nih.gov/projects/gap/cgi-bin/study.cgi?study_id="),
                study, ""),
            "tag_pk": pc.cast(batch["tag_pk"], pa.int64()),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow", batch_size=None)
