"""Multimodal binary-column plumbing: schema, batch shape, determinism,
and the clearly-marked decode seam (sits_spark.operators.multimodal)."""

import numpy as np
import pytest

from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from sits_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark, tmp_path_factory):
    rows = [(i, f"payload-{i} " * (i % 7 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "media_id long, body string")
    return multimodal.to_media_table(df, "media_id", "body", kind="audio")


def test_media_table_schema_and_metadata(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,n_bytes:bigint,"
        "content_md5:string>"
    )
    row = media.where(F.col("media_id") == 3).first()
    assert bytes(row.payload).decode() == "payload-3 " * 4
    assert row.n_bytes == len(bytes(row.payload))
    assert row.kind == "audio"


def test_feature_extraction_fake_decoder_deterministic(media):
    feats = multimodal.extract_features(media, decode_stub="fake")
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,n_bytes:bigint,feat:array<float>>"
    )
    got = feats.orderBy("media_id").toPandas()
    assert len(got) == 200
    # deterministic: features are a pure function of payload bytes
    row5 = np.array(got.loc[got.media_id == 5, "feat"].iloc[0])
    want = multimodal._fake_features(("payload-5 " * 6).encode())
    assert np.array_equal(row5, want)
    # repeated runs identical
    again = multimodal.extract_features(media, decode_stub="fake").orderBy("media_id").toPandas()
    assert all(
        np.array_equal(np.array(a), np.array(b))
        for a, b in zip(got["feat"], again["feat"])
    )
    # batch shape: k features per row, float32
    assert all(len(f) == multimodal.N_FEATURES for f in got["feat"])


def test_feature_extraction_fail_stub_raises(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.extract_features(media, decode_stub="fail").count()


def test_invalid_stub_rejected(media):
    with pytest.raises(ValueError):
        multimodal.extract_features(media, decode_stub="nope")
