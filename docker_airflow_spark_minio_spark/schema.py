"""Declarative schema system.

Re-expresses the reference's external schema model -- an ordered list of
``{'col_name', 'data_type', 'order'}`` dicts (reference:
spark/jobs/job_silver.py:33-50) with a type-name -> Spark-type mapping
(reference: spark/python_libs/decase/decase/utils.py:210-233) -- as plain
``StructType`` machinery.  Entries whose name contains ``'#'`` are comment/
partition metadata and are excluded (reference: job_silver.py:52-61,
utils.py:191); partition columns may instead be flagged via
``comment: {'partition': {'enabled': True, 'order_sort': n}}``
(reference: utils.py:269-276).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

# Type-name -> Spark type (reference utils.py:210-233).  `float`/`decimal`
# intentionally widen to double, matching the reference's conformance pass
# ("Using DoubleType for float compatibility", utils.py:218).
TYPE_MAP: dict[str, T.DataType] = {
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "double": T.DoubleType(),
    "float": T.DoubleType(),
    "decimal": T.DoubleType(),
    "real": T.DoubleType(),
    "money": T.DoubleType(),
    "currency": T.DoubleType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    # extension surface: typed arrays for embeddings / token lists
    "array<float>": T.ArrayType(T.FloatType()),
    "array<double>": T.ArrayType(T.DoubleType()),
    "array<string>": T.ArrayType(T.StringType()),
    "array<long>": T.ArrayType(T.LongType()),
}

DescribeList = list[dict[str, Any]]


def spark_type(type_name: str) -> T.DataType:
    """Map a declared type name to a Spark type; unknown -> string
    (fallback behavior per reference utils.py:233)."""
    return TYPE_MAP.get(type_name.strip().lower(), T.StringType())


def is_comment_entry(entry: dict[str, Any]) -> bool:
    """Entries with '#' in the column name are metadata, not columns
    (reference job_silver.py:52-61)."""
    return "#" in str(entry.get("col_name", ""))


def data_entries(describe_list: DescribeList) -> DescribeList:
    """Real column entries, in declared ``order``."""
    cols = [e for e in describe_list if not is_comment_entry(e)]
    return sorted(cols, key=lambda e: e.get("order", 0))


def string_read_schema(
    describe_list: DescribeList, exclude: tuple[str, ...] | list[str] = ()
) -> T.StructType:
    """All-string read schema for bronze NDJSON: kills the inference pass
    (an extra full scan at 100 TB); :func:`..conform.conform`'s try_cast
    applies the declared types with null-on-malformed afterwards.
    ``exclude`` drops columns not present in the raw payload (derived
    partition literals)."""
    return T.StructType(
        [
            T.StructField(e["col_name"], T.StringType(), True)
            for e in data_entries(describe_list)
            if e["col_name"] not in set(exclude)
        ]
    )


def partition_columns(describe_list: DescribeList) -> list[str]:
    """Columns flagged as partition keys via ``comment.partition``
    (reference utils.py:269-276), sorted by ``order_sort``."""
    parts = [
        e
        for e in data_entries(describe_list)
        if (e.get("comment") or {}).get("partition", {}).get("enabled")
    ]
    parts.sort(key=lambda e: e["comment"]["partition"].get("order_sort", 0))
    return [e["col_name"] for e in parts]


def to_struct_type(describe_list: DescribeList) -> T.StructType:
    """Declared schema -> StructType, in declared order."""
    return T.StructType(
        [
            T.StructField(e["col_name"], spark_type(e["data_type"]), nullable=True)
            for e in data_entries(describe_list)
        ]
    )


def from_struct_type(struct: T.StructType) -> DescribeList:
    """StructType -> describe_list (round-trip helper)."""
    inverse = {
        T.IntegerType(): "int",
        T.LongType(): "bigint",
        T.BooleanType(): "boolean",
        T.DoubleType(): "double",
        T.TimestampType(): "timestamp",
        T.DateType(): "date",
        T.StringType(): "string",
        T.BinaryType(): "binary",
    }
    return [
        {
            "col_name": f.name,
            "data_type": inverse.get(f.dataType, f.dataType.simpleString()),
            "order": i + 1,
        }
        for i, f in enumerate(struct.fields)
    ]


# The reference's silver table schema (reference job_silver.py:33-50; DDL
# :66-88).  Effective stored types follow the conformance pass, so
# longitude/latitude are double even though the DDL says FLOAT
# (SURVEY.md section 1.2).
BREWERY_DESCRIBE_LIST: DescribeList = [
    {"col_name": "id", "data_type": "string", "order": 1},
    {"col_name": "name", "data_type": "string", "order": 2},
    {"col_name": "brewery_type", "data_type": "string", "order": 3},
    {"col_name": "address_1", "data_type": "string", "order": 4},
    {"col_name": "address_2", "data_type": "string", "order": 5},
    {"col_name": "address_3", "data_type": "string", "order": 6},
    {"col_name": "city", "data_type": "string", "order": 7},
    {"col_name": "state_province", "data_type": "string", "order": 8},
    {"col_name": "postal_code", "data_type": "string", "order": 9},
    {"col_name": "country", "data_type": "string", "order": 10},
    {"col_name": "longitude", "data_type": "float", "order": 11},
    {"col_name": "latitude", "data_type": "float", "order": 12},
    {"col_name": "phone", "data_type": "bigint", "order": 13},
    {"col_name": "website_url", "data_type": "string", "order": 14},
    {"col_name": "state", "data_type": "string", "order": 15},
    {"col_name": "street", "data_type": "string", "order": 16},
    {
        "col_name": "sys_file_date",
        "data_type": "date",
        "order": 17,
        "comment": {"partition": {"enabled": True, "order_sort": 1}},
    },
]
