"""Pins for the r7 batch-three review fixes: asof NULL semantics +
determinism, NaN-safe cosine scoring, LSH long buckets, frame-sample
null handling, constant-group z-score nulls."""

import math

import pytest
from pyspark.sql import functions as F


class TestAsofNullSemantics:
    def test_null_right_ts_never_matches(self, spark):
        from datafusion_spatial_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 100)], ["k", "lts"])
        right = spark.createDataFrame(
            [(1, None, "ghost"), (1, 50, "real")],
            "k int, rts int, tag string",
        )
        out = asof_join(left, right, "k", "lts", "rts", ["tag"]).collect()
        assert out[0].tag_asof == "real"
        # with ONLY the null-ts right row there must be NO match at all
        right2 = spark.createDataFrame(
            [(1, None, "ghost")], "k int, rts int, tag string"
        )
        out2 = asof_join(left, right2, "k", "lts", "rts", ["tag"]).collect()
        assert out2[0].tag_asof is None

    def test_null_left_ts_matches_nothing(self, spark):
        from datafusion_spatial_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, None)], "k int, lts int")
        right = spark.createDataFrame(
            [(1, 50, "x")], "k int, rts int, tag string"
        )
        for d in ("backward", "forward"):
            out = asof_join(
                left, right, "k", "lts", "rts", ["tag"], direction=d
            ).collect()
            assert out[0].tag_asof is None, d

    def test_null_keys_never_match_each_other(self, spark):
        from datafusion_spatial_spark.operators.asof import asof_join

        left = spark.createDataFrame([(None, 100)], "k int, lts int")
        right = spark.createDataFrame(
            [(None, 50, "x")], "k int, rts int, tag string"
        )
        out = asof_join(left, right, "k", "lts", "rts", ["tag"]).collect()
        assert out[0].tag_asof is None

    def test_same_ts_duplicates_deterministic(self, spark):
        from datafusion_spatial_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 100)], ["k", "lts"])
        right = spark.createDataFrame(
            [(1, 50, "a"), (1, 50, "b")], "k int, rts int, tag string"
        )
        got = {
            asof_join(
                left.repartition(p), right.repartition(7 - p),
                "k", "lts", "rts", ["tag"],
            ).collect()[0].tag_asof
            for p in (1, 2, 3)
        }
        assert got == {"b"}  # max payload struct, every partitioning


class TestNaNCosine:
    def test_nan_vector_excluded_from_topk(self, spark):
        from datafusion_spatial_spark.operators.simsearch import cosine_topk

        rows = [
            (1, [1.0, 0.0]),
            (2, [float("nan"), 1.0]),
            (3, [0.9, 0.1]),
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = cosine_topk(df, "embedding", "vec_id", [1.0, 0.0], k=2).collect()
        assert [r.vec_id for r in out] == [1, 3]
        assert all(not math.isnan(r.score) for r in out)

    def test_nan_vector_not_near_dup(self, spark):
        from datafusion_spatial_spark.operators.simsearch import (
            cosine_near_dup_pairs,
            random_hyperplanes,
        )

        rows = [(i, [1.0, float(i) * 1e-4]) for i in range(5)]
        rows.append((99, [float("nan"), 1.0]))
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        planes = random_hyperplanes(2, 2, seed=1)
        out = cosine_near_dup_pairs(
            df, "embedding", "vec_id", threshold=0.9, planes=planes
        ).collect()
        assert all(r.id_a != 99 and r.id_b != 99 for r in out)
        assert len(out) > 0  # the clean near-dups still pair

    def test_lsh_bucket_long_and_plane_cap(self, spark):
        from datafusion_spatial_spark.operators.simsearch import (
            lsh_bucket,
            random_hyperplanes,
        )

        df = spark.createDataFrame([(1, [1.0] * 4)], ["vec_id", "embedding"])
        planes = random_hyperplanes(4, 34, seed=2)
        out = lsh_bucket(df, "embedding", "vec_id", planes)
        assert dict(out.dtypes)["bucket"] == "bigint"
        assert out.collect()[0].bucket >= 0  # no int32 wraparound
        with pytest.raises(ValueError, match="62"):
            lsh_bucket(df, "embedding", "vec_id", random_hyperplanes(4, 63))


class TestFrameSampleNulls:
    def test_null_and_zero_duration_rows_survive(self, spark):
        from datafusion_spatial_spark.operators import multimodal

        rows = [
            (1, bytearray(b"v1"), 2500),
            (2, bytearray(b"v2"), 0),
            (3, bytearray(b"v3"), None),
        ]
        df = spark.createDataFrame(
            rows, "id int, media binary, duration_ms int"
        )
        out = multimodal.frame_sample_plan(df, "media", "id", every_ms=1000)
        got = {}
        for r in out.collect():
            got.setdefault(r.id, []).append(r.sample_ms)
        assert sorted(got[1]) == [0, 1000, 2000]
        assert got[2] == [None] and got[3] == [None]  # no phantom t=0


class TestNormalizeConstantGroupNulls:
    def test_null_value_stays_null(self, spark):
        from datafusion_spatial_spark.operators.groupedmap import (
            normalize_per_group,
        )

        df = spark.createDataFrame(
            [("g", 5.0), ("g", 5.0), ("g", None)], "grp string, v double"
        )
        out = {(
            r.v, r.zscore) for r in normalize_per_group(df, "grp", "v").collect()}
        assert (5.0, 0.0) in out
        assert (None, None) in out


class TestMediaDecodeGuard:
    def test_corrupt_payload_yields_null_not_crash(self, spark):
        from datafusion_spatial_spark.operators import multimodal

        def decoder(b: bytes):
            if b == b"bad":
                raise ValueError("corrupt")
            return [float(len(b))]

        df = spark.createDataFrame(
            [(1, bytearray(b"okay")), (2, bytearray(b"bad"))],
            "id int, media binary",
        )
        out = {
            r.id: r.features
            for r in multimodal.with_media_features(
                df, "media", decode=decoder, out_col="features"
            ).collect()
        }
        assert out[1] == [4.0] and out[2] is None


class TestNullSpatialKeys:
    def test_st_hilbert_null_geometry_is_null(self, spark):
        from datafusion_spatial_spark.functions.indexing import st_hilbert
        from datafusion_spatial_spark.functions.scalar import st_point
        from datafusion_spatial_spark.meta import GeometryMeta

        pm = GeometryMeta(encoding="point", geometry_types=("Point",))
        df = spark.createDataFrame([(1, 5.0), (2, None)], "id int, x double")
        g = F.when(F.col("x").isNotNull(), st_point(F.col("x"), F.col("x")))
        out = {
            r.id: r.h
            for r in df.select(
                "id",
                st_hilbert(g.alias("g"), pm, (0, 0, 10, 10), 6).alias("h"),
            ).collect()
        }
        assert out[1] is not None
        assert out[2] is None  # not the fabricated max-corner cell

    def test_st_tile_null_point_is_null(self, spark):
        from datafusion_spatial_spark.functions.geodesic import st_quadkey, st_tile
        from datafusion_spatial_spark.functions.scalar import st_point

        df = spark.createDataFrame([(1, 10.0), (2, None)], "id int, x double")
        g = F.when(F.col("x").isNotNull(), st_point(F.col("x"), F.col("x")))
        rows = {
            r.id: (r.t, r.q)
            for r in df.select(
                "id",
                st_tile(g, 5).alias("t"),
                st_quadkey(g, 5).alias("q"),
            ).collect()
        }
        assert rows[1][0].x is not None and rows[1][1] is not None
        assert rows[2][0].x is None and rows[2][0].y is None
        assert rows[2][1] is None  # not the bottom-right '33333'


class TestDissolveBigIntKeys:
    def test_int64_keys_with_nulls_exact(self, spark):
        # r7 review fix: keys round-tripped through pandas became float64
        # when the batch contained a null, corrupting ids above 2^53
        from datafusion_spatial_spark.operators.spatial_agg import dissolve
        from datafusion_spatial_spark.functions.scalar import st_geomfromtext
        from datafusion_spatial_spark.meta import GeometryMeta

        big = (1 << 62) + 1
        rows = [
            (big, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
            (big + 2048, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
            (None, "POLYGON ((9 9, 10 9, 10 10, 9 10, 9 9))"),
        ]
        df = spark.createDataFrame(rows, "k long, w string").select(
            "k", st_geomfromtext("w").alias("g")
        ).coalesce(1)  # one batch -> the null forces the old float64 path
        out = dissolve(df, ["k"], "g", GeometryMeta(encoding="WKB"))
        keys = sorted(
            (r.k for r in out.collect()), key=lambda v: (v is None, v)
        )
        assert keys == [big, big + 2048, None]  # distinct, bit-exact


class TestTransformZMAndNulls:
    def test_translate_preserves_zm(self, spark):
        from datafusion_spatial_spark.functions.transforms import st_translate
        from datafusion_spatial_spark.meta import GeometryMeta

        meta = GeometryMeta(
            encoding="linestring", geometry_types=("LineString ZM",)
        )
        rows = [([{"x": 0.0, "y": 0.0, "z": 5.0, "m": 9.0},
                  {"x": 1.0, "y": 1.0, "z": 6.0, "m": 10.0}],)]
        df = spark.createDataFrame(
            rows,
            "g array<struct<x double, y double, z double, m double>>",
        )
        out = df.select(st_translate("g", 10.0, 20.0, meta).alias("t")).collect()[0].t
        assert out[0].x == 10.0 and out[0].y == 20.0
        assert out[0].z == 5.0 and out[0].m == 9.0  # Z/M pass through
        assert out[1].z == 6.0 and out[1].m == 10.0

    def test_null_point_stays_null(self, spark):
        from datafusion_spatial_spark.functions.transforms import st_translate
        from datafusion_spatial_spark.meta import GeometryMeta

        pm = GeometryMeta(encoding="point", geometry_types=("Point",))
        df = spark.createDataFrame(
            [(1, {"x": 1.0, "y": 2.0}), (2, None)],
            "id int, g struct<x double, y double>",
        )
        out = {r.id: r.t for r in df.select(
            "id", st_translate("g", 1.0, 1.0, pm).alias("t")).collect()}
        assert out[1].x == 2.0
        assert out[2] is None  # not a struct of null fields

    def test_makepolygon_null_holes_keeps_shell(self, spark):
        from datafusion_spatial_spark.functions.transforms import st_makepolygon

        ring = [{"x": 0.0, "y": 0.0}, {"x": 1.0, "y": 0.0},
                {"x": 1.0, "y": 1.0}, {"x": 0.0, "y": 0.0}]
        df = spark.createDataFrame(
            [(ring, None)],
            "ring array<struct<x double, y double>>, "
            "holes array<array<struct<x double, y double>>>",
        )
        out = df.select(st_makepolygon("ring", "holes").alias("p")).collect()[0].p
        assert out is not None and len(out) == 1  # shell survives


class TestAccessorZM:
    def test_startpoint_keeps_measure(self, spark):
        from datafusion_spatial_spark import wkb as W
        from datafusion_spatial_spark.functions.accessors import st_startpoint
        from datafusion_spatial_spark.meta import GeometryMeta

        g = W.Geom("LineString", [(0.0, 0.0, 5.0), (1.0, 1.0, 6.0)],
                   has_z=False, has_m=True)
        df = spark.createDataFrame([(bytearray(W.dumps(g)),)], "g binary")
        meta = GeometryMeta(encoding="WKB", geometry_types=("LineString M",))
        out = df.select(st_startpoint("g", meta).alias("p")).collect()[0].p
        pt = W.loads(bytes(out))
        assert pt.has_m and tuple(pt.coords) == (0.0, 0.0, 5.0)

    def test_numgeometries_point_empty_is_zero(self, spark):
        from datafusion_spatial_spark import wkb as W
        from datafusion_spatial_spark.functions.accessors import st_numgeometries
        from datafusion_spatial_spark.meta import GeometryMeta

        df = spark.createDataFrame(
            [(bytearray(W.dumps(W.from_wkt("POINT EMPTY"))),),
             (bytearray(W.dumps(W.from_wkt("POINT (1 1)"))),)],
            "g binary",
        )
        meta = GeometryMeta(encoding="WKB")
        vals = [r.n for r in df.select(st_numgeometries("g", meta).alias("n")).collect()]
        assert vals == [0, 1]
