#!/usr/bin/env python
"""Fill BASELINE.md's comparison table: wall time per headline query,
Spark (noop write) vs DuckDB oracle (fetch), same sf directory."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from vectordb_similarity_search_spark.plans import REGISTRY
from vectordb_similarity_search_spark.session import get_spark
from vectordb_similarity_search_spark.sources.tables import TABLES
from bench import HEADLINE

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="bench-compare")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

rows = []
for name in HEADLINE:
    spec = REGISTRY[name]
    t0 = time.time()
    spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    s_sec = time.time() - t0
    if spec.oracle:
        t0 = time.time()
        con.execute(spec.oracle).fetchall()
        d_sec = time.time() - t0
        ratio = s_sec / d_sec if d_sec > 0 else float("inf")
        rows.append((name, round(s_sec,2), round(d_sec,2), round(ratio,1), ""))
    else:
        rows.append((name, round(s_sec,2), None, None, "rows-only (no SQL twin)"))

print(json.dumps(rows))
