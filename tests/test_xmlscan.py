from biokg_spark.operators.xmlscan import xml_extract_records

DOC1 = """<db>
  <drug><id>DB1</id><name>alpha</name><group>approved</group></drug>
  <drug><id>DB2</id><name>beta</name></drug>
</db>"""
DOC2 = "<db><drug><id>DB3</id><name>gamma</name><group>withdrawn</group></drug></db>"


def test_xml_extract_records(spark):
    df = spark.createDataFrame([("f1", DOC1), ("f2", DOC2)], "src string, xml string")
    out = xml_extract_records(
        df, "xml", "drug",
        {"drug_id": "id", "name": "name", "grp": "group"},
        keys=("src",),
    )
    rows = {r.drug_id: r for r in out.collect()}
    assert set(rows) == {"DB1", "DB2", "DB3"}
    assert rows["DB1"].grp == "approved" and rows["DB1"].src == "f1"
    assert rows["DB2"].grp is None  # missing path -> NULL
    assert rows["DB3"].name == "gamma" and rows["DB3"].src == "f2"


def test_xml_empty_and_parallel(spark):
    df = spark.createDataFrame(
        [("f1", DOC1), ("f2", None), ("f3", "<db></db>")],
        "src string, xml string",
    ).repartition(3)
    out = xml_extract_records(df, "xml", "drug", {"drug_id": "id"}, keys=("src",))
    assert {r.drug_id for r in out.collect()} == {"DB1", "DB2"}


ADVERSARIAL_DOC = """<dump>
  <entry><id>e1</id><name>plain</name><score>9</score></entry>
  <entry>
    <id>outer</id><name>has nested</name>
    <entry><id>inner</id><name>nested rec</name></entry>
  </entry>
  <entry><id>e3</id></entry>
  <entry><id>e4</id><name></name><extra><deep>d4</deep></extra></entry>
  <other><id>not-a-record</id></other>
  <entry><id>e5</id><name>unicode &#304;stanbul &amp; &lt;tags&gt;</name></entry>
</dump>"""


def test_xml_adversarial_nested_missing_fields(spark):
    """Nested records each yield a row; missing fields are NULL; empty
    elements are empty-or-null text; entities decode; non-record tags
    are ignored (reference posture: parsers.py:568-630 stream-extracts
    per record element)."""
    from biokg_spark.operators.xmlscan import xml_extract_records

    df = spark.createDataFrame([(1, ADVERSARIAL_DOC)], "doc_id long, xml string")
    out = xml_extract_records(
        df, "xml", "entry",
        {"id": "id", "name": "name", "deep": "extra/deep"},
        keys=("doc_id",),
    )
    rows = {r.id: (r.name, r.deep) for r in out.collect()}
    assert set(rows) == {"e1", "inner", "outer", "e3", "e4", "e5"}
    assert rows["e1"] == ("plain", None)
    assert rows["inner"] == ("nested rec", None)
    assert rows["outer"] == ("has nested", None)  # inner clear leaves outer intact
    assert rows["e3"] == (None, None)  # missing fields -> NULL
    assert rows["e4"][1] == "d4"  # nested path extraction
    assert rows["e5"][0] == "unicode İstanbul & <tags>"


def test_xml_malformed_payloads(spark):
    """on_error='skip' keeps records completed before the syntax error and
    never fails the task; the default raises."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from biokg_spark.operators.xmlscan import xml_extract_records

    good = "<d><entry><id>g1</id></entry></d>"
    truncated = "<d><entry><id>t1</id></entry><entry><id>t2</id"  # cut mid-tag
    not_xml = "{\"json\": true}"
    df = spark.createDataFrame(
        [(1, good), (2, truncated), (3, not_xml)], "doc_id long, xml string"
    ).coalesce(1)

    out = xml_extract_records(
        df, "xml", "entry", {"id": "id"}, keys=("doc_id",), on_error="skip"
    )
    got = {(r.doc_id, r.id) for r in out.collect()}
    assert got == {(1, "g1"), (2, "t1")}  # t2 dropped, json doc yields nothing

    strict = xml_extract_records(df, "xml", "entry", {"id": "id"}, keys=("doc_id",))
    with pytest.raises(Exception):
        strict.collect()
