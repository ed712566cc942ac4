"""Source/sink format round-trips (the reference has no file I/O at all —
SURVEY.md §2.1 'File formats' row): parquet is the primary store; CSV,
JSON, and ORC round-trip through the DataFrame reader/writer with schema
preserved."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_similarity_search_spark.sources.tables import load_table


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_formats(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / fmt)
    writer = src.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(path) if fmt != "csv" else writer.csv(path)

    reader = spark.read
    if fmt == "csv":
        back = reader.option("header", True).schema(src.schema).csv(path)
    elif fmt == "json":
        back = reader.schema(src.schema).json(path)
    else:
        back = getattr(reader, fmt)(path)

    assert back.count() == src.count()
    a = sorted(src.select("doc_id", "lang", "n_chars").collect())
    b = sorted(back.select("doc_id", "lang", "n_chars").collect())
    assert a == b
