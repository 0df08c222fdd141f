"""Tests: multimodal column plumbing, file sinks, validation suites."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_api_spark.operators.multimodal import (
    attach_basic_metadata,
    decode_features,
    media_schema,
    resize_images,
    sample_video_frames,
    set_decoder,
    _DECODERS,
)
from feature_store_api_spark.operators.validation import (
    DataValidationError,
    ExpectColumnMeanToBeBetween,
    ExpectColumnValuesToBeBetween,
    ExpectColumnValuesToBeInSet,
    ExpectColumnValuesToBeUnique,
    ExpectColumnValuesToNotBeNull,
    ExpectTableRowCountToBeBetween,
    ExpectationSuite,
    validate_for_ingest,
)
from feature_store_api_spark.sources.writers import (
    read_training_dataset,
    write_dataframe,
    write_training_dataset,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        ("m1", b"\x89PNG fake image bytes one", ("image", "png", 4, 4, 3, None, None, None)),
        ("m2", b"RIFF fake wav bytes", ("audio", "wav", None, None, 1, 16000, 2000, None)),
        ("m3", b"\x00\x00ftyp fake mp4", ("video", "mp4", 8, 8, 3, None, 5000, 90)),
        ("m4", None, None),
    ]
    return spark.createDataFrame(rows, media_schema())


def test_attach_basic_metadata(media_df):
    out = attach_basic_metadata(media_df).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id["m1"]["n_bytes"] == 25
    assert by_id["m4"]["n_bytes"] is None
    assert len(by_id["m1"]["content_sha1"]) == 40


def test_decode_features_real_image_decoder(spark):
    """The default image decoder is REAL: dimensions/channels/format
    come from actual magic-byte parsing, and PNG/BMP feature vectors
    are pixel channel means — not a hash-based stub."""
    from feature_store_api_spark.operators import image_codec as ic

    rows = [
        ("png", ic.encode_png(6, 4, (10, 20, 30))),
        ("bmp", ic.encode_bmp(5, 3, (200, 100, 50))),
        ("gif", ic.encode_gif(7, 2, (1, 2, 3))),
        ("jpg", ic.encode_jpeg_header(123, 45, 3)),
        ("bad", b"not an image at all"),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    out = decode_features(df, meta_col=None, media_type="image").collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(out) == 6
    png = by_id["png"]
    assert (png["decoded_width"], png["decoded_height"]) == (6, 4)
    assert png["n_channels"] == 3 and png["format"] == "png"
    assert [round(v * 255) for v in png["feature_vec"]] == [10, 20, 30]
    bmp = by_id["bmp"]
    assert (bmp["decoded_width"], bmp["decoded_height"]) == (5, 3)
    assert [round(v * 255) for v in bmp["feature_vec"]] == [200, 100, 50]
    gif = by_id["gif"]
    assert (gif["decoded_width"], gif["decoded_height"]) == (7, 2)
    assert gif["format"] == "gif" and gif["feature_vec"] is None
    jpg = by_id["jpg"]
    assert (jpg["decoded_width"], jpg["decoded_height"]) == (123, 45)
    assert jpg["format"] == "jpeg" and jpg["n_channels"] == 3
    # corrupt + null content → recorded errors, not job failures
    assert by_id["bad"]["decode_error"] and by_id["bad"]["feature_vec"] is None
    assert by_id["nul"]["decode_error"]


def test_decode_features_unregistered_type_uses_fake(media_df):
    """Media types without a registered decoder fall back to the
    deterministic digest fake, keeping the plumbing testable."""
    out = decode_features(media_df, media_type="video").collect()
    by_id = {r["media_id"]: r for r in out}
    v3 = by_id["m3"]["feature_vec"]
    assert len(v3) == 16 and all(0.0 <= x < 1.0 for x in v3)
    again = decode_features(media_df, media_type="video").collect()
    assert {r["media_id"]: r["feature_vec"] for r in again}["m3"] == v3
    # metadata passes through to the fake decoder
    assert by_id["m3"]["decoded_width"] == 8


def test_decode_features_custom_decoder(media_df):
    def audio_decoder(content, meta):
        return {"feature_vec": [float(len(content))], "decoded_width": None,
                "decoded_height": None}

    prev = _DECODERS.get("audio")
    set_decoder("audio", audio_decoder)
    try:
        out = decode_features(media_df, media_type="audio").collect()
        by_id = {r["media_id"]: r for r in out}
        assert by_id["m2"]["feature_vec"] == [19.0]
    finally:
        _DECODERS["audio"] = prev  # restore the default WAV decoder


def test_decode_features_real_wav_decoder(spark):
    """Default audio decoder really parses RIFF/WAV: header metadata
    for any WAV, per-channel RMS features for PCM-16."""
    import math

    from feature_store_api_spark.operators import image_codec as ic

    tone = [[math.sin(i / 5.0) * 0.5 for i in range(400)]]
    rows = [
        ("wav", ic.encode_wav(tone, sample_rate=8000)),
        ("bad", b"RIFF fake wav bytes"),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    out = {r["media_id"]: r for r in
           decode_features(df, meta_col=None, media_type="audio").collect()}
    wav = out["wav"]
    assert wav["format"] == "wav" and wav["n_channels"] == 1
    # RMS of a 0.5-amplitude sine ≈ 0.5/sqrt(2)
    assert abs(wav["feature_vec"][0] - 0.5 / math.sqrt(2)) < 0.02
    assert out["bad"]["decode_error"]


def test_resize_real_nearest_neighbor(spark):
    """Default resize really decodes pixels (PNG/BMP) and re-encodes:
    output parses back with target dims and preserved solid color."""
    from feature_store_api_spark.operators import image_codec as ic

    df = spark.createDataFrame(
        [("a", ic.encode_png(8, 8, (100, 150, 200))),
         ("b", ic.encode_bmp(5, 7, (1, 2, 3)))],
        "media_id string, content binary",
    )
    out = {r["media_id"]: r for r in resize_images(df, 4, 2).collect()}
    for mid, color in (("a", (100, 150, 200)), ("b", (1, 2, 3))):
        hdr, rows = ic.decode_pixels(bytes(out[mid]["content"]))
        assert (hdr["width"], hdr["height"]) == (4, 2)
        assert tuple(round(m * 255) for m in ic.channel_means(rows, 3)) == color


def test_resize_requires_codec_when_registry_emptied(media_df):
    prev = _DECODERS.pop("image_resize", None)
    try:
        with pytest.raises(Exception) as e:
            resize_images(media_df, 32, 32).collect()
        assert "NotImplementedError" in str(e.value) or isinstance(
            e.value, NotImplementedError
        )
    finally:
        if prev is not None:
            _DECODERS["image_resize"] = prev


def test_sample_video_frames(media_df):
    out = sample_video_frames(media_df, every_nth=30).collect()
    # m3 has 90 frames -> indices 0, 30, 60; others emit frame 0 only
    m3 = sorted(r["frame_index"] for r in out if r["media_id"] == "m3")
    assert m3 == [0, 30, 60]
    assert all(r["frame_index"] == 0 for r in out if r["media_id"] != "m3")


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt", ["parquet", "csv", "tsv", "orc"])
def test_write_read_roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id bigint, s string, v double"
    )
    path = str(tmp_path / fmt)
    write_dataframe(df, fmt, path)
    back = read_training_dataset(spark, fmt, path)
    got = sorted((r["id"], r["s"], r["v"]) for r in back.collect())
    assert got == [(1, "a", 1.5), (2, "b", 2.5)]


def test_write_training_dataset_splits(spark, tmp_path):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    splits = {"train": df.where("id < 80"), "test": df.where("id >= 80")}
    written = write_training_dataset(splits, "parquet", str(tmp_path / "td"))
    assert set(written) == {"train", "test"}
    train = spark.read.parquet(written["train"])
    test = spark.read.parquet(written["test"])
    assert train.count() == 80 and test.count() == 20


def test_write_coalesce_single_file(spark, tmp_path):
    df = spark.range(1000).repartition(8)
    path = str(tmp_path / "single")
    write_dataframe(df, "parquet", path, coalesce=True)
    parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(parts) == 1


def test_tfrecord_read_requires_schema(spark, tmp_path):
    """tf.train.Example features are unordered/untyped on disk — the
    jarless reader demands an explicit schema."""
    from feature_store_api_spark.sources.readers import read

    df = spark.range(5)
    write_dataframe(df, "tfrecord", str(tmp_path / "tf"))
    with pytest.raises(ValueError, match="schema"):
        read(spark, "tfrecord", str(tmp_path / "tf"))


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------

@pytest.fixture()
def val_df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "b", 30.0), (4, None, 120.0)],
        "id bigint, cat string, v double",
    )


def test_suite_single_pass_all_results(val_df):
    suite = ExpectationSuite(
        [
            ExpectColumnValuesToNotBeNull("id"),
            ExpectColumnValuesToNotBeNull("cat"),
            ExpectColumnValuesToBeBetween("v", min_value=0, max_value=100),
            ExpectColumnValuesToBeUnique("id"),
            ExpectColumnValuesToBeInSet("cat", value_set=["a", "b"]),
            ExpectColumnMeanToBeBetween("v", min_value=0, max_value=50),
            ExpectTableRowCountToBeBetween(min_value=1, max_value=10),
        ]
    )
    report = suite.validate(val_df)
    by_type = {(r.expectation_type, r.column): r for r in report.results}
    assert report.evaluated == 7
    assert by_type[("expect_column_values_to_not_be_null", "id")].success
    assert not by_type[("expect_column_values_to_not_be_null", "cat")].success
    oob = by_type[("expect_column_values_to_be_between", "v")]
    assert not oob.success and oob.observed["out_of_bounds"] == 1
    assert by_type[("expect_column_values_to_be_unique", "id")].success
    assert by_type[("expect_column_values_to_be_in_set", "cat")].success
    assert by_type[("expect_column_mean_to_be_between", "v")].success
    assert not report.success


def test_strict_policy_raises(val_df):
    suite = ExpectationSuite(
        [ExpectColumnValuesToNotBeNull("cat")],
        validation_ingestion_policy=ExpectationSuite.STRICT,
    )
    with pytest.raises(DataValidationError):
        validate_for_ingest(val_df, suite)


def test_always_policy_returns_report(val_df):
    suite = ExpectationSuite([ExpectColumnValuesToNotBeNull("cat")])
    report = validate_for_ingest(val_df, suite)
    assert report is not None and not report.success
    assert validate_for_ingest(val_df, None) is None

def test_avro_training_dataset_roundtrip(spark, sf_dir, tmp_path):
    """Jarless .avro container files: write splits, read back, values
    intact (engine/spark.py:865-919 avro format parity)."""
    from feature_store_api_spark.sources.readers import read_parquet
    from feature_store_api_spark.sources.writers import (
        read_training_dataset, write_training_dataset,
    )

    o = read_parquet(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    out = str(tmp_path / "td_avro")
    write_training_dataset({"train": o.limit(700), "test": o.limit(200)}, "avro", out)
    train = read_training_dataset(spark, "avro", f"{out}/train")
    assert train.count() == 700
    assert dict(train.dtypes) == dict(o.dtypes)
    a = {r["o_orderkey"]: r["o_totalprice"] for r in train.collect()}
    b = {r["o_orderkey"]: r["o_totalprice"] for r in o.limit(700).collect()}
    assert a == b


def test_avro_complex_and_null_columns_roundtrip(spark, tmp_path):
    from feature_store_api_spark.sources.avro_container import read_avro, write_avro

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], "x"), (2, None, None)],
        "id long, emb array<double>, name string",
    )
    out = str(tmp_path / "a")
    write_avro(df, out)
    back = read_avro(spark, out)
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["emb"] == [1.0, 2.0] and rows[2]["emb"] is None
    assert rows[1]["name"] == "x" and rows[2]["name"] is None

def test_tfrecord_training_dataset_roundtrip(spark, sf_dir, tmp_path):
    """Jarless TFRecord (tf.train.Example) write + schema'd read:
    int64/string exact; floats are float32 like the connector."""
    from feature_store_api_spark.sources.readers import read_parquet
    from feature_store_api_spark.sources.writers import (
        read_training_dataset, write_training_dataset,
    )

    o = read_parquet(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    ).limit(500)
    out = str(tmp_path / "td_tfr")
    write_training_dataset({"": o}, "tfrecord", out)
    back = read_training_dataset(spark, "tfrecord", out, schema=o.schema)
    assert back.count() == 500
    a = {r["o_orderkey"]: r for r in back.collect()}
    b = {r["o_orderkey"]: r for r in o.collect()}
    assert set(a) == set(b)
    for k in list(b)[:50]:
        assert a[k]["o_orderstatus"] == b[k]["o_orderstatus"]
        assert a[k]["o_custkey"] == b[k]["o_custkey"]
        assert abs(a[k]["o_totalprice"] - b[k]["o_totalprice"]) < 0.5  # f32


def test_tfrecord_arrays_nulls_and_framing(spark, tmp_path):
    from pyspark.sql import types as T
    from feature_store_api_spark.sources.tfrecord import (
        read_tfrecord, write_tfrecord, _crc32c,
    )

    # crc32c known-answer test (public test vector)
    assert _crc32c(b"123456789") == 0xE3069283

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("emb", T.ArrayType(T.FloatType())),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("name", T.StringType()),
    ])
    df = spark.createDataFrame(
        [(1, [1.5, -2.25], ["a", "b"], "x"), (2, None, None, None)], schema
    )
    out = str(tmp_path / "tfr")
    write_tfrecord(df, out)
    back = {r["id"]: r for r in read_tfrecord(spark, out, schema).collect()}
    assert back[1]["emb"] == [1.5, -2.25]  # exact in float32
    assert back[1]["tags"] == ["a", "b"] and back[1]["name"] == "x"
    assert back[2]["emb"] is None and back[2]["name"] is None


def test_expectation_suite_gates_ingestion(spark, tmp_path):
    from feature_store_api_spark import FeatureStore
    from feature_store_api_spark.operators.validation import (
        DataValidationError,
        ExpectColumnValuesToBeBetween,
        ExpectColumnValuesToNotBeNull,
        ExpectationSuite,
    )

    fs = FeatureStore(root=str(tmp_path / "val"))
    fg = fs.create_feature_group("gated", primary_key=["k"])
    fg.save_expectation_suite(ExpectationSuite(
        [
            ExpectColumnValuesToNotBeNull(column="v"),
            ExpectColumnValuesToBeBetween(column="v", min_value=0.0, max_value=100.0),
        ],
        validation_ingestion_policy="STRICT",
    ))
    fg.insert(spark.createDataFrame([(1, 5.0), (2, 50.0)], "k long, v double"))
    with pytest.raises(DataValidationError):
        fg.insert(spark.createDataFrame([(3, 500.0)], "k long, v double"))
    # STRICT breach wrote nothing
    assert fg.read(spark).count() == 2
    # ALWAYS records the failure but lets the write through
    fg.expectation_suite.validation_ingestion_policy = "ALWAYS"
    fg.insert(spark.createDataFrame([(3, 500.0)], "k long, v double"))
    assert fg.read(spark).count() == 3
    hist = fg.get_validation_history()
    assert len(hist) == 3  # newest first
    assert hist[0]["success"] is False and hist[-1]["success"] is True


def test_ge_suite_roundtrip_and_wire_variant(spark):
    """GE-format interchange: canonical dict → suite → dict round-trip,
    the reference's camelCase/JSON-string wire shape parses, unknown
    expectation types fail loudly, and an imported suite validates."""
    ge = {
        "expectation_suite_name": "s1",
        "expectations": [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "a"}, "meta": {"note": "n1"}},
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "b", "min_value": 0, "max_value": 10}},
            {"expectation_type": "expect_table_row_count_to_be_between",
             "kwargs": {"min_value": 1, "max_value": 100}},
        ],
        "meta": {"validation_ingestion_policy": "STRICT"},
    }
    suite = ExpectationSuite.from_ge_json(ge)
    assert suite.name == "s1"
    assert suite.validation_ingestion_policy == "STRICT"
    assert [e.expectation_type for e in suite.expectations] == [
        e["expectation_type"] for e in ge["expectations"]
    ]
    assert suite.expectations[0].column == "a"
    assert suite.expectations[1].kwargs == {"min_value": 0, "max_value": 10}
    assert ExpectationSuite.from_ge_json(suite.to_ge_json()).to_ge_json() == suite.to_ge_json()
    assert suite.to_ge_json()["expectations"][0]["meta"] == {"note": "n1"}

    # reference wire variant: camelCase type key, kwargs/meta JSON-encoded
    # strings (ge_expectation.py:80-87)
    import json
    wire = {
        "expectationSuiteName": "s2",
        "validationIngestionPolicy": "always",
        "expectations": [
            {"expectationType": "expect_column_values_to_be_in_set",
             "kwargs": json.dumps({"column": "c", "value_set": ["x", "y"]}),
             "meta": json.dumps({"id": 7})},
        ],
    }
    s2 = ExpectationSuite.from_ge_json(wire)
    assert s2.name == "s2" and s2.validation_ingestion_policy == "ALWAYS"
    assert s2.expectations[0].kwargs == {"value_set": ["x", "y"]}
    assert s2.expectations[0].meta == {"id": 7}

    with pytest.raises(ValueError, match="Unsupported expectation type"):
        ExpectationSuite.from_ge_json({
            "expectations": [{"expectation_type": "expect_column_kl_divergence",
                              "kwargs": {}}]
        })

    # an imported suite actually validates
    df = spark.createDataFrame([(1, 5.0), (2, 20.0)], "a long, b double")
    report = suite.validate(df)
    assert report.evaluated == 3
    fails = {r.expectation_type for r in report.failures()}
    assert fails == {"expect_column_values_to_be_between"}  # b=20 > 10
