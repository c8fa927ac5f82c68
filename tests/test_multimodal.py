from __future__ import annotations

import hashlib

from biokg_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    extract_media_features,
    synth_media,
)


def test_media_feature_extraction(spark):
    media = synth_media(spark, n=30)
    feats = extract_media_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 30
    # deterministic: recompute one content hash on the driver
    payload = bytes(media.where("media_id = 0").first().payload)
    assert rows[0].content_hash == hashlib.md5(payload).hexdigest()
    assert rows[0].n_bytes == 16
    assert 16 <= rows[0].width < 80 and 16 <= rows[0].height < 80


def test_media_metadata_query_prunes_payload(spark):
    """Metadata-only projection must not read the payload column
    (column pruning — check the scan's ReadSchema)."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        synth_media(spark, n=10).write.mode("overwrite").parquet(d)
        scan = spark.read.parquet(d).select("media_id", "kind")
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "payload" not in plan
