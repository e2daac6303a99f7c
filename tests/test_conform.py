"""Unit tests for the schema system and the conform projection.

The richest parity surface is the reference's cast decision table
(decase/utils.py:241-263): every (declared type x incoming type) behavior
-- add-missing-as-null, drop-extra, cast-with-null-on-failure, reorder.
"""

from __future__ import annotations

from pyspark.sql import types as T

from docker_airflow_spark_minio_spark.conform import conform, with_literal_partition
from docker_airflow_spark_minio_spark.schema import (
    BREWERY_DESCRIBE_LIST,
    data_entries,
    partition_columns,
    spark_type,
    to_struct_type,
)

SCHEMA = [
    {"col_name": "id", "data_type": "string", "order": 1},
    {"col_name": "qty", "data_type": "bigint", "order": 2},
    {"col_name": "price", "data_type": "float", "order": 3},
    {"col_name": "when", "data_type": "date", "order": 4},
    {"col_name": "# comment entry", "data_type": "string", "order": 99},
]


def test_type_map_widens_float_to_double():
    assert spark_type("float") == T.DoubleType()
    assert spark_type("decimal") == T.DoubleType()
    assert spark_type("unknown_type") == T.StringType()


def test_comment_entries_excluded():
    assert [e["col_name"] for e in data_entries(SCHEMA)] == ["id", "qty", "price", "when"]


def test_struct_type_order():
    st = to_struct_type(SCHEMA)
    assert [f.name for f in st.fields] == ["id", "qty", "price", "when"]
    assert st["price"].dataType == T.DoubleType()


def test_brewery_partition_columns():
    assert partition_columns(BREWERY_DESCRIBE_LIST) == ["sys_file_date"]


def test_conform_add_missing_drop_extra_cast_reorder(spark):
    df = spark.createDataFrame(
        [
            ("a", "123", "extra1", "2024-01-02"),
            ("b", "not_a_number", "extra2", None),
        ],
        "id string, qty string, junk string, `when` string",
    )
    out = conform(df, SCHEMA)
    assert out.columns == ["id", "qty", "price", "when"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["qty"] == 123  # string -> bigint cast
    assert rows["b"]["qty"] is None  # non-numeric -> null (reference parity)
    assert rows["a"]["price"] is None  # missing column added as null
    assert str(rows["a"]["when"]) == "2024-01-02"
    assert out.schema["qty"].dataType == T.LongType()


def test_conform_is_single_projection(spark):
    df = spark.createDataFrame([("a", "1")], "id string, qty string")
    out = conform(df, SCHEMA)
    # one logical Project over the source — no chained withColumns
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("Project") == 1


def test_with_literal_partition(spark):
    df = spark.createDataFrame([("a",)], "id string")
    out = with_literal_partition(df, "sys_file_date", "2024-03-05")
    row = out.collect()[0]
    assert str(row["sys_file_date"]) == "2024-03-05"
    assert out.schema["sys_file_date"].dataType == T.DateType()


def test_conform_with_rejects_routes_lossy_rows(spark):
    from docker_airflow_spark_minio_spark.conform import conform_with_rejects
    from docker_airflow_spark_minio_spark.schema import BREWERY_DESCRIBE_LIST

    df = spark.createDataFrame(
        [
            ("1", "Alpha", "5551234"),          # clean
            ("2", "Beta", "not-a-phone"),       # phone loses its value
            ("3", "Gamma", None),               # NULL input is not a loss
        ],
        "id string, name string, phone string",
    )
    valid, rejects = conform_with_rejects(df, BREWERY_DESCRIBE_LIST)
    assert sorted(r["id"] for r in valid.collect()) == ["1", "3"]
    rej = rejects.collect()
    assert [r["id"] for r in rej] == ["2"]
    assert rej[0]["_reject_cols"] == ["phone"]
    # the reject row carries the ORIGINAL raw value for replay
    assert rej[0]["phone"] == "not-a-phone"


def test_silver_quarantine_table(spark, tmp_path):
    import json, os

    from docker_airflow_spark_minio_spark.jobs import run_silver
    from docker_airflow_spark_minio_spark.metrics import RunMetrics
    from docker_airflow_spark_minio_spark.storage import TableManager

    bronze = str(tmp_path / "bronze")
    day = "2024-03-01"
    os.makedirs(f"{bronze}/sys_file_date={day}")
    with open(f"{bronze}/sys_file_date={day}/f.json", "w") as f:
        for rec in [
            {"id": "1", "name": "A", "phone": "5551234"},
            {"id": "2", "name": "B", "phone": "bad-value"},
        ]:
            f.write(json.dumps(rec) + "\n")
    wh = str(tmp_path / "wh")
    m = RunMetrics()
    n = run_silver(
        spark, bronze, day, wh, metrics=m, quarantine_table="dw.tab_brewery_rejects"
    )
    assert n == 1  # only the clean row lands in silver
    assert m.counters["rows_rejected"] == 1
    rej = TableManager(spark, wh).read("dw.tab_brewery_rejects").collect()
    assert len(rej) == 1 and rej[0]["phone"] == "bad-value"
    assert rej[0]["_reject_cols"] == ["phone"]
