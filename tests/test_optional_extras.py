"""Contract tests for the optional-extra gates: the lakehouse jar probe
(sources/lakehouse.py) and the pyproj CRS backend (geom_ops._pyproj_transform).

The sandbox has neither the lakehouse jars nor pyproj installed, so the
"absent" branches run for real here; the "present" branches run against
mocks so both sides of each gate have executed coverage (VERDICT r6 #8 /
#5 — a user with the real dependency must not be the first to execute the
code path).
"""

from __future__ import annotations

import sys
import types

import pytest

from datafusion_spatial_spark import geom_ops as G
from datafusion_spatial_spark.sources import lakehouse
from datafusion_spatial_spark.wkb import Geom


# ---------------------------------------------------------------------------
# lakehouse jar gate


class _Recorder:
    """Duck-typed stand-in for spark.read / df.write fluent chains."""

    def __init__(self):
        self.calls = []

    def format(self, fmt):
        self.calls.append(("format", fmt))
        return self

    def load(self, path):
        self.calls.append(("load", path))
        return "LOADED"

    def mode(self, m):
        self.calls.append(("mode", m))
        return self

    def options(self, **kw):
        self.calls.append(("options", kw))
        return self

    def save(self, path):
        self.calls.append(("save", path))


def test_lakehouse_probe_absent_real_jvm(spark):
    # this image ships none of the three format jars — the Class.forName
    # miss branch runs for real
    for fmt in ("delta", "iceberg", "hudi"):
        assert lakehouse._format_available(spark, fmt) is False


def test_lakehouse_read_raises_actionable(spark):
    with pytest.raises(NotImplementedError) as ei:
        lakehouse.read_table(spark, "delta", "/tmp/nope")
    msg = str(ei.value)
    assert "delta" in msg and "spark.jars.packages" in msg
    assert "io.delta.sql.DeltaSparkSessionExtension" in msg


def test_lakehouse_write_raises_actionable(spark):
    df = spark.range(1)
    with pytest.raises(NotImplementedError) as ei:
        lakehouse.write_table(df, "iceberg", "/tmp/nope")
    assert "iceberg" in str(ei.value)


def test_lakehouse_probe_present_branch():
    # fake JVM where Class.forName resolves -> True branch executes
    class _Cls:
        @staticmethod
        def forName(name):
            return object()

    jvm = types.SimpleNamespace(
        java=types.SimpleNamespace(lang=types.SimpleNamespace(Class=_Cls))
    )
    fake = types.SimpleNamespace(_jvm=jvm)
    assert lakehouse._format_available(fake, "delta") is True


def test_lakehouse_read_routes_when_available(monkeypatch):
    monkeypatch.setattr(lakehouse, "_format_available", lambda s, f: True)
    rec = _Recorder()
    fake = types.SimpleNamespace(read=rec)
    out = lakehouse.read_table(fake, "delta", "/data/t")
    assert out == "LOADED"
    assert rec.calls == [("format", "delta"), ("load", "/data/t")]


def test_lakehouse_write_routes_when_available(monkeypatch):
    monkeypatch.setattr(lakehouse, "_format_available", lambda s, f: True)
    rec = _Recorder()
    fake_df = types.SimpleNamespace(
        write=rec, sparkSession=types.SimpleNamespace()
    )
    lakehouse.write_table(fake_df, "hudi", "/data/t", mode="append", x="1")
    assert rec.calls == [
        ("format", "hudi"),
        ("mode", "append"),
        ("options", {"x": "1"}),
        ("save", "/data/t"),
    ]


# ---------------------------------------------------------------------------
# pyproj CRS gate


PT = Geom("Point", (30.0, 10.0))


def test_transform_unknown_epsg_names_pyproj_extra():
    # pyproj is absent in this sandbox: the closed-form miss must raise an
    # error that names the extra (not a cryptic failure)
    assert "pyproj" not in sys.modules or not hasattr(
        sys.modules.get("pyproj"), "Transformer"
    )
    with pytest.raises(NotImplementedError) as ei:
        G.transform(PT, 4326, 2056)
    assert "pyproj" in str(ei.value)


def test_transform_closed_form_unaffected_by_gate():
    # built-in pairs never consult pyproj
    out = G.transform(PT, 4326, 3857)
    assert out.type_name == "Point"
    assert abs(out.coords[0] - 3339584.723) < 1.0


def _install_fake_pyproj(monkeypatch, record):
    class _FakeTransformer:
        def __init__(self, src, dst):
            self.src, self.dst = src, dst

        @classmethod
        def from_crs(cls, src, dst, always_xy=False):
            record.append(("from_crs", src, dst, always_xy))
            return cls(src, dst)

        def transform(self, x, y):
            record.append(("transform", x, y))
            return (x + 100.0, y + 200.0)

    mod = types.ModuleType("pyproj")
    mod.Transformer = _FakeTransformer
    monkeypatch.setitem(sys.modules, "pyproj", mod)
    monkeypatch.setattr(G, "_PYPROJ_CACHE", {})


def test_transform_routes_through_pyproj_when_present(monkeypatch):
    record = []
    _install_fake_pyproj(monkeypatch, record)
    out = G.transform(PT, 4326, 2056)
    assert out.coords == (130.0, 210.0)
    assert out.srid == 2056
    assert ("from_crs", "EPSG:4326", "EPSG:2056", True) in record


def test_transform_pyproj_transformer_cached_per_pair(monkeypatch):
    record = []
    _install_fake_pyproj(monkeypatch, record)
    line = Geom("LineString", [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)])
    # 2056 (Swiss LV95, oblique Mercator) is outside the closed-form
    # set — r10 added 27700 as a built-in TM, so it no longer reaches
    # pyproj; the Swiss oblique Mercator family stays the fallback case
    G.transform(line, 4326, 2056)
    builds = [r for r in record if r[0] == "from_crs"]
    assert len(builds) == 1  # one Transformer per (src, dst), not per vertex
    hits = [r for r in record if r[0] == "transform"]
    assert len(hits) == 3


def test_transform_closed_form_wins_over_pyproj(monkeypatch):
    # when both could serve a pair, the hermetic closed form is used, so
    # results are identical with or without the extra installed
    record = []
    _install_fake_pyproj(monkeypatch, record)
    out = G.transform(PT, 4326, 3857)
    assert record == []
    assert abs(out.coords[0] - 3339584.723) < 1.0
