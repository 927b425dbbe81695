"""Contract tests for Table/File models and SQL templating.

Modeled on the reference's tier-1 unit tests (SURVEY §5): e.g.
``tests/sql/operators/test_merge.py:16-72`` (columns normalization and
invalid-type raise) and the identifier-safety checks."""

from __future__ import annotations

import pytest

from astro_spark import File, FileType, IllegalIdentifierError, Metadata, Table, TempTable
from astro_spark.operators.append import normalize_columns
from astro_spark.plans.identifiers import render_literal, render_sql
from astro_spark.table import MAX_TABLE_NAME_LENGTH


class TestTable:
    def test_unnamed_becomes_temp(self):
        t = Table()
        assert t.temp and t.name.startswith("_tmp")
        assert len(t.name) <= MAX_TABLE_NAME_LENGTH

    def test_tmp_prefix_becomes_temp(self):
        assert Table(name="_tmp_foo").temp

    def test_named_not_temp(self):
        assert not Table(name="orders").temp

    def test_temp_factory(self):
        t = TempTable()
        assert t.temp and t.name.startswith("_tmp")

    def test_qualified_name_with_schema(self):
        t = Table(name="x", metadata=Metadata(schema="analytics"))
        assert t.qualified_name == "analytics.x"

    def test_illegal_identifier_rejected(self):
        with pytest.raises(IllegalIdentifierError):
            Table(name="bad name; DROP TABLE x")

    def test_json_roundtrip(self):
        t = Table(name="x", metadata=Metadata(schema="s"))
        t2 = Table.from_json(t.to_json())
        assert t2.name == "x" and t2.metadata.schema == "s" and not t2.temp


class TestFile:
    @pytest.mark.parametrize(
        "path,expected",
        [
            ("/a/b.csv", FileType.CSV),
            ("/a/b.ndjson", FileType.NDJSON),
            ("/a/b.jsonl", FileType.NDJSON),
            ("/a/b.json", FileType.JSON),
            ("/a/b.parquet", FileType.PARQUET),
            ("/a/*.csv", FileType.CSV),
        ],
    )
    def test_filetype_inference(self, path, expected):
        assert File(path).filetype == expected

    def test_directory_has_no_type(self):
        assert File("/a/b").filetype is None

    def test_pattern_flag(self):
        assert File("/a/*.csv").is_pattern and not File("/a/b.csv").is_pattern


class TestColumnsNormalization:
    """Reference contract: list/tuple/dict → same map (test_merge.py:16-54)."""

    def test_list(self):
        assert normalize_columns(["a", "b"]) == {"a": "a", "b": "b"}

    def test_tuple(self):
        assert normalize_columns(("a", "b")) == {"a": "a", "b": "b"}

    def test_dict(self):
        assert normalize_columns({"s": "t"}) == {"s": "t"}

    def test_invalid_type_raises(self):
        with pytest.raises(ValueError, match="columns is not a valid type"):
            normalize_columns("a,b")


class TestTemplating:
    def test_table_substitution(self):
        sql = render_sql("SELECT * FROM {{t}}", {"t": Table(name="orders")})
        assert sql == "SELECT * FROM orders"

    def test_scalar_literals(self):
        sql = render_sql(
            "SELECT * FROM t WHERE a = {{x}} AND b = {{s}}", {"x": 5, "s": "it's"}
        )
        assert sql == "SELECT * FROM t WHERE a = 5 AND b = 'it\\'s'"

    def test_unbound_raises(self):
        with pytest.raises(IllegalIdentifierError, match="unbound"):
            render_sql("SELECT {{nope}}", {})

    def test_injection_via_table_name_rejected(self):
        with pytest.raises(IllegalIdentifierError):
            render_sql("SELECT * FROM {{t}}", {"t": "x; DROP TABLE y", "__ident_t__": True})

    def test_literal_rendering(self):
        import datetime as dt

        assert render_literal(None) == "NULL"
        assert render_literal(True) == "TRUE"
        assert render_literal([1, 2]) == "(1, 2)"
        assert render_literal(dt.date(2024, 1, 2)) == "DATE '2024-01-02'"


class TestDatasetURIs:
    def test_table_uri(self):
        from astro_spark import Metadata, Table

        t = Table("orders", conn_id="c1", metadata=Metadata(schema="sales"))
        assert t.dataset_uri == "astro://c1@?table=orders&schema=sales"

    def test_file_uri(self):
        from astro_spark import File

        assert File("/data/x.csv").dataset_uri == "file:///data/x.csv"
        assert File("s3a://b/k.parquet").dataset_uri == "s3a://b/k.parquet"
