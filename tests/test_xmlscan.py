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
