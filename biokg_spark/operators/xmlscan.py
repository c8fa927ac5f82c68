"""XML record extraction from payload columns (SURVEY.md §2.1 S4).

The reference stream-parses XML with ``ET.iterparse``, clearing elements
as it goes: HPA ``parse_database_xml`` (reference: biokg/processing/
parsers.py:568-630), DrugBank inside a zip member (parsers.py:1180-1218),
MeSH supplementary records (parsers.py:3097-3132). There is no spark-xml
jar in this sandbox, so the Spark-native form is a vectorized
``mapInPandas`` scan over an XML string/binary column: the ElementTree
parse happens executor-side per Arrow batch, elements are cleared after
use exactly like the reference, and each record element yields one output
row of extracted fields.

At scale the XML payloads arrive as a column of a distributed table
(binaryFile source or an upstream extract), so parallelism is the table's
partitioning — no driver-side parsing ever.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


def xml_extract_records(
    df: DataFrame,
    xml_col: str,
    record_tag: str,
    fields: dict[str, str],
    keys: tuple[str, ...] = (),
    on_error: str = "raise",
) -> DataFrame:
    """One output row per ``<record_tag>`` element per input document.

    ``fields`` maps output column → relative element path (ElementTree
    ``find`` syntax); missing paths yield NULL. ``keys`` are input columns
    carried through. All extracted fields are strings (the reference's
    only type, SURVEY.md §1.2).

    Nested ``record_tag`` elements each yield their own row (inner records
    complete first under iterparse end-events; clearing the inner subtree
    does not disturb the outer record's own fields).

    ``on_error``: ``'raise'`` (default) propagates malformed-XML parse
    errors — one bad payload fails the job loudly; ``'skip'`` keeps the
    records that COMPLETED before the syntax error and drops the rest of
    that document — the posture for dirty web-scale corpora where a task
    must not die on one truncated payload.
    """
    if on_error not in ("raise", "skip"):
        raise ValueError(f"unknown on_error {on_error!r}")
    key_fields = [df.schema[k] for k in keys]
    schema = StructType(
        key_fields + [StructField(name, StringType()) for name in fields]
    )
    field_items = list(fields.items())
    keys_l = list(keys)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            key_vals = pdf[keys_l].itertuples(index=False, name=None)
            for kv, doc in zip(key_vals, pdf[xml_col].tolist()):
                if not doc:
                    continue
                # iterparse + clear: constant memory per document, like the
                # reference's entry.clear() (parsers.py:625)
                import io

                data = doc.encode() if isinstance(doc, str) else bytes(doc)
                doc_rows: list[tuple] = []
                try:
                    for _ev, elem in ET.iterparse(io.BytesIO(data), events=("end",)):
                        if elem.tag != record_tag:
                            continue
                        doc_rows.append(
                            kv
                            + tuple(
                                (elem.find(path).text if elem.find(path) is not None else None)
                                if path != "."
                                else elem.text
                                for _name, path in field_items
                            )
                        )
                        elem.clear()
                except ET.ParseError:
                    if on_error == "raise":
                        raise
                    # 'skip': records completed before the error survive
                rows.extend(doc_rows)
            cols = keys_l + [name for name, _p in field_items]
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return df.select(*keys_l, xml_col).mapInPandas(run, schema=schema)
