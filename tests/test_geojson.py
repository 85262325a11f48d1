"""Structural validation of the GeoJSON emit path (K5) — the JSON
text can't be string-compared across engines, so parse and assert the
FeatureCollection contract instead."""

from __future__ import annotations

import json


def test_geojson_features_are_valid(spark, sf_dir):
    from utils_infra_spark.queries.advanced_queries import geojson_features_emit

    rows = geojson_features_emit(spark, sf_dir).limit(20).collect()
    assert rows
    for r in rows:
        f = json.loads(r.feature_json)
        assert f["type"] == "Feature"
        assert f["id"] == f"C{r.id}"
        assert f["geometry"]["type"] == "Point"
        lon, lat = f["geometry"]["coordinates"]
        assert -180 <= lon <= 180 and -90 <= lat <= 90
        assert set(f["properties"]) == {"segment", "name"}


def test_feature_collection_assembly(spark, sf_dir):
    from pyspark.sql import functions as F

    from utils_infra_spark.queries.advanced_queries import geojson_features_emit

    feats = geojson_features_emit(spark, sf_dir).limit(5)
    fc = feats.agg(
        F.to_json(
            F.struct(
                F.lit("FeatureCollection").alias("type"),
                F.collect_list(F.col("feature_json")).alias("features"),
            )
        ).alias("fc")
    ).first()
    doc = json.loads(fc.fc)
    assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 5
