"""UDF/UDAF/UDTF surface (§2.10) + multimodal decode plumbing (§2.12)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_engineering_1_spark.functions.udfs import (
    clean_whitespace_pyudf,
    mapinpandas_tokens,
    register_udfs,
    weighted_mean_udaf,
    zscore_per_group,
)
from data_engineering_1_spark.multimodal import decode as MM
from data_engineering_1_spark.operators.chunking import (
    chunk_text,
    clean_whitespace,
)


class TestUDTFChunker:
    def test_matches_pure_spark_chunker(self, spark):
        register_udfs(spark)
        text = "All work and no play makes a dull boy. " * 30  # 1170 chars
        via_udtf = spark.sql(
            "SELECT chunk_number, chunk_text FROM chunk_text_udtf(%s)"
            % ("'" + text.rstrip() + "'",)
        ).collect()
        via_plan = (
            chunk_text(
                spark.createDataFrame([(text.rstrip(),)], "cleaned string")
            )
            .select("chunk_number", "chunk_text")
            .collect()
        )
        assert sorted(
            [(r.chunk_number, r.chunk_text) for r in via_udtf]
        ) == sorted([(r.chunk_number, r.chunk_text) for r in via_plan])

    def test_short_text_passthrough(self, spark):
        register_udfs(spark)
        rows = spark.sql(
            "SELECT * FROM chunk_text_udtf('short text')"
        ).collect()
        assert [(r.chunk_number, r.chunk_text) for r in rows] == [
            (None, "short text")
        ]


class TestPandasUDAF:
    def test_weighted_mean_vs_sql(self, spark):
        df = spark.createDataFrame(
            [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0)],
            "g string, v double, w double",
        )
        got = {
            r.g: r.wm
            for r in df.groupBy("g")
            .agg(weighted_mean_udaf("v", "w").alias("wm"))
            .collect()
        }
        assert got["a"] == pytest.approx((10 + 60) / 4.0)
        assert got["b"] == pytest.approx(5.0)


class TestGroupedMap:
    def test_zscore_per_group(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 7.0)],
            "g string, v double",
        )
        out = zscore_per_group(df, "g", "v").collect()
        a = sorted(r.zscore for r in out if r.g == "a")
        assert a == pytest.approx([-1.2247448, 0.0, 1.2247448], abs=1e-6)
        assert [r.zscore for r in out if r.g == "b"] == [0.0]


class TestSlowPathPinned:
    def test_python_udf_equals_jvm_expression(self, spark):
        df = spark.createDataFrame(
            [("  a   b\t\tc  \n",), ("x",), (None,)], "s string"
        )
        both = df.select(
            clean_whitespace_pyudf()("s").alias("py"),
            clean_whitespace("s").alias("jvm"),
        ).collect()
        for r in both:
            assert r.py == r.jvm


class TestMapInPandasTokens:
    def test_matches_explode_split(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, ""), (3, " one two  three ")],
            "doc_id bigint, text string",
        )
        got = sorted(
            (r.doc_id, r.token) for r in mapinpandas_tokens(df).collect()
        )
        assert got == [(1, "hello"), (1, "world"), (3, "one"), (3, "three"), (3, "two")]


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNGfake-image-bytes-1", {}),
        (2, "image", b"\x89PNGfake-image-bytes-2", {}),
        (3, "audio", b"RIFFfake-wave-data", {}),
        (4, "video", b"\x00\x00ftypfake-mp4", {"duration_ms": "3500"}),
        (5, "video", b"\x00\x00ftypfake-mp4-b", {}),  # no duration meta
    ]
    return spark.createDataFrame(
        rows, "media_id bigint, modality string, content binary, meta map<string,string>"
    )


class TestMultimodal:
    def test_image_features_deterministic(self, spark, media):
        out = {r.media_id: r for r in MM.image_features(media).collect()}
        assert set(out) == {1, 2}
        r = out[1]
        assert r.sha256 == hashlib.sha256(b"\x89PNGfake-image-bytes-1").hexdigest()
        assert r.decoder == "fake-md5"
        assert r.width >= 16 and r.height >= 16
        # re-running yields identical fakes (pure function of bytes)
        again = {x.media_id: x for x in MM.image_features(media).collect()}
        assert (r.width, r.height, r.mean_luma) == (
            again[1].width, again[1].height, again[1].mean_luma,
        )

    def test_audio_features(self, spark, media):
        rows = MM.audio_features(media).collect()
        assert len(rows) == 1 and rows[0].media_id == 3
        assert rows[0].sample_rate in (8000, 16000, 22050, 44100)
        assert 0.0 <= rows[0].rms <= 1.0

    def test_frame_sampling_fanout(self, spark, media):
        frames = MM.sample_frames(media, every_ms=1000).collect()
        by_id = {}
        for f in frames:
            by_id.setdefault(f.media_id, []).append(f)
        # 3500ms at 1fps -> frames at 0,1000,2000,3000
        assert sorted(f.ts_ms for f in by_id[4]) == [0, 1000, 2000, 3000]
        assert sorted(f.frame_idx for f in by_id[4]) == [0, 1, 2, 3]
        assert 5 not in by_id  # no duration meta -> no frames
        # distinct frames get distinct digests
        digests = [f.frame_sha256 for f in by_id[4]]
        assert len(set(digests)) == 4


def test_mapinarrow_matches_jvm_expressions(spark, sf_dir):
    """mapInArrow byte/char stats must equal the JVM built-ins
    (octet_length / length) row for row."""
    from pyspark.sql import functions as F

    from data_engineering_1_spark.functions.udfs import mapinarrow_byte_stats
    from data_engineering_1_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = (
        mapinarrow_byte_stats(docs)
        .orderBy("doc_id")
        .toPandas()
    )
    exp = (
        docs.select(
            "doc_id",
            F.octet_length("text").alias("n_bytes"),
            F.length("text").alias("n_chars_arrow"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert (got["n_bytes"].values == exp["n_bytes"].values).all()
    assert (got["n_chars_arrow"].values == exp["n_chars_arrow"].values).all()


def test_polymorphic_udtf_analyze_schema(spark):
    """§2.10 completion: a UDTF whose output schema is computed at plan
    time by ``analyze`` from a constant argument — 2-arg call yields 2
    columns, 4-arg yields 4 — and composes with LATERAL over a table."""
    from data_engineering_1_spark.functions.udfs import register_udfs

    register_udfs(spark)
    two = spark.sql("SELECT * FROM split_fixed_udtf('a,b,c', 2)")
    assert two.columns == ["c0", "c1"]
    assert [tuple(r) for r in two.collect()] == [("a", "b")]
    four = spark.sql("SELECT * FROM split_fixed_udtf('a,b,c', 4)")
    assert four.columns == ["c0", "c1", "c2", "c3"]
    assert [tuple(r) for r in four.collect()] == [("a", "b", "c", None)]
    lat = spark.sql(
        """
        SELECT t.id, u.c0, u.c1
        FROM VALUES (1, 'x,y'), (2, 'z') AS t(id, csv),
             LATERAL split_fixed_udtf(t.csv, 2) u
        ORDER BY t.id
        """
    ).collect()
    assert [tuple(r) for r in lat] == [(1, "x", "y"), (2, "z", None)]


class TestResize:
    def test_resize_images_plumbing(self, spark, media):
        """§2.12 resize: binary in -> binary out through Arrow-batched
        mapInPandas; deterministic fake emits exactly target_w*target_h
        bytes per image, stable across runs; non-image rows never cross
        the Python boundary."""
        out = {r.media_id: r for r in MM.resize_images(media, 8, 6).collect()}
        assert set(out) == {1, 2}  # images only
        for r in out.values():
            assert (r.target_w, r.target_h) == (8, 6)
            assert r.decoder == "pillow" or r.decoder.startswith(
                ("fake-md5", "decode-error:")
            )
            if r.decoder != "pillow":  # fake legs emit exactly w*h bytes
                assert len(bytes(r.resized)) == 8 * 6
            assert (
                hashlib.sha256(bytes(r.resized)).hexdigest() == r.resized_sha256
            )
        again = {
            x.media_id: x for x in MM.resize_images(media, 8, 6).collect()
        }
        assert {k: v.resized_sha256 for k, v in again.items()} == {
            k: v.resized_sha256 for k, v in out.items()
        }

    def test_corrupt_payload_degrades_per_row(self, monkeypatch):
        """ADVICE r4 + r5: with Pillow INSTALLED, a corrupt payload must
        not fail the task — _resize_image degrades to the deterministic
        fake for that row, tagged decode-error:<ExcName> — but ONLY for
        payload-shaped failures (OSError/ValueError, the
        UnidentifiedImageError / DecompressionBombError families);
        programming errors (TypeError etc.) must PROPAGATE (r5: they are
        bugs, not bad data). Simulated with a stub PIL."""
        import sys
        import types

        import pytest

        class _Boom(OSError):  # what UnidentifiedImageError subclasses
            pass

        stub = types.ModuleType("PIL")
        stub_img = types.ModuleType("PIL.Image")

        def _open(_):
            raise _Boom("cannot identify image file")

        stub_img.open = _open
        stub.Image = stub_img
        monkeypatch.setitem(sys.modules, "PIL", stub)
        monkeypatch.setitem(sys.modules, "PIL.Image", stub_img)

        payload = b"\x00not-an-image\xff" * 7
        data, dec = MM._resize_image(payload, 8, 6)
        assert dec == "decode-error:_Boom"
        assert len(data) == 8 * 6

        # the r5 half: an unexpected exception type is NOT masked
        def _open_bug(_):
            raise TypeError("bad argument wiring")

        stub_img.open = _open_bug
        with pytest.raises(TypeError):
            MM._resize_image(payload, 8, 6)
        stub_img.open = _open  # restore for the fake-leg check below
        # deterministic: same bytes as the no-PIL fake leg (a None
        # sys.modules entry forces ImportError even if PIL is installed)
        monkeypatch.setitem(sys.modules, "PIL", None)
        monkeypatch.delitem(sys.modules, "PIL.Image")
        data2, dec2 = MM._resize_image(payload, 8, 6)
        assert dec2 == "fake-md5" and data2 == data


def test_udtf_table_argument_partition_by(spark, sf_dir):
    """§2.10 completion (X90): a UDTF consuming a TABLE argument with
    PARTITION BY — Spark feeds each partition's rows through eval()
    and calls terminate() per partition, i.e. a Python aggregation
    operator in SQL. The per-partition type counts must re-sum to the
    exact global counts."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udtf

    from data_engineering_1_spark.io import load_table

    @udtf(returnType="event_type STRING, n INT")
    class CountPerPartition:
        def __init__(self):
            self.counts = {}

        def eval(self, row):
            t = row["event_type"]
            self.counts[t] = self.counts.get(t, 0) + 1

        def terminate(self):
            for t, n in sorted(self.counts.items()):
                yield t, n

    spark.udtf.register("count_types_t", CountPerPartition)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("tudtf_ev")
    got = {
        r["event_type"]: r["total"]
        for r in spark.sql(
            """
            SELECT event_type, SUM(n) AS total
            FROM count_types_t(TABLE(tudtf_ev) PARTITION BY user_id % 4)
            GROUP BY event_type
            """
        ).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
