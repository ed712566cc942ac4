#!/usr/bin/env python
"""Two modes:

``--pins [bench_result.json]`` (the round-5 mechanical delta): compare a
bench run against the committed per-query pins in ``bench_pins.json``
(round-4 VERDICT order #4 — the headline 14 had a committed baseline
table, the pipeline/ann/analytics/write groups only had prose notes).
Comparison is on BLEND-NORMALIZED seconds (raw / blend_factor), the
cross-round-comparable series on this noisy VM; raw numbers print beside
them. Exit 1 if any query regresses past --threshold (default 2.0x
normalized — the same "don't chase deltas under ~2x without a profile"
bar ROUND_NOTES records for this VM's noise).

Default mode (round-1 behavior): wall time per headline query, Spark
(noop write) vs DuckDB oracle (fetch), same sf directory — fills
BASELINE.md's original comparison table.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PINS_PATH = os.path.join(ROOT, "bench_pins.json")
GROUPS = [
    ("queries", "headline"),
    ("pipeline_queries", "pipeline"),
    ("ann_queries", "ann"),
    ("analytics_queries", "analytics"),
    ("write_queries", "write"),
]


def compare_pins(result_path: str, threshold: float) -> int:
    with open(PINS_PATH) as fh:
        pins = json.load(fh)
    with open(result_path) as fh:
        res = json.load(fh)
    pin_blend = pins["blend_factor"]
    cur_blend = res["blend_factor"]
    print(
        f"pin: {pins['pinned_at']} blend={pin_blend}  "
        f"current: blend={cur_blend} (machine {res['machine_factor']}/"
        f"{res['machine_factor_io']} io)"
    )
    worst = []
    for res_key, group in GROUPS:
        cur = res.get(res_key, {})
        pinned = pins["groups"].get(group, {})
        rows = []
        for q, pin_raw in pinned.items():
            pin_norm = pin_raw / pin_blend
            if q not in cur:
                rows.append((q, pin_raw, None, None, "MISSING from run"))
                # a pinned query absent from the run is lost regression
                # coverage, not a pass — fail the gate
                worst.append((group, q, "MISSING"))
                continue
            cur_norm = cur[q] / cur_blend
            ratio = cur_norm / pin_norm if pin_norm > 0 else float("inf")
            flag = "REGRESSED" if ratio > threshold else ""
            rows.append((q, pin_raw, cur[q], round(ratio, 2), flag))
            if ratio > threshold:
                worst.append((group, q, round(ratio, 2)))
        extra = sorted(set(cur) - set(pinned))
        print(f"\n== {group} ({len(rows)} pinned"
              + (f", {len(extra)} unpinned new: {extra}" if extra else "")
              + ")")
        for q, pr, cr, ratio, flag in sorted(
            rows, key=lambda r: -(r[3] or 0)
        ):
            cur_s = f"{cr:6.3f}" if cr is not None else "  --  "
            rat_s = f"{ratio:5.2f}x" if ratio is not None else "  --  "
            print(f"  {q:28s} pin {pr:6.3f}  now {cur_s}  norm {rat_s} {flag}")
    if worst:
        print(
            f"\nFAIL (regressed past {threshold}x normalized, or pinned "
            f"query missing from the run): {worst}"
        )
        return 1
    print(f"\nOK: no query past {threshold}x normalized vs pins")
    return 0


def duckdb_compare() -> int:
    import time

    import duckdb

    from bench import HEADLINE
    from vectordb_similarity_search_spark.plans import REGISTRY
    from vectordb_similarity_search_spark.session import get_spark
    from vectordb_similarity_search_spark.sources.tables import TABLES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-compare")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = []
    for name in HEADLINE:
        spec = REGISTRY[name]
        t0 = time.time()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        s_sec = time.time() - t0
        if spec.oracle:
            t0 = time.time()
            con.execute(spec.oracle).fetchall()
            d_sec = time.time() - t0
            ratio = s_sec / d_sec if d_sec > 0 else float("inf")
            rows.append(
                (name, round(s_sec, 2), round(d_sec, 2), round(ratio, 1), "")
            )
        else:
            rows.append(
                (name, round(s_sec, 2), None, None, "rows-only (no SQL twin)")
            )
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    if "--pins" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--pins"]
        threshold = 2.0
        if "--threshold" in args:
            i = args.index("--threshold")
            try:
                threshold = float(args[i + 1])
            except (IndexError, ValueError):
                raise SystemExit(
                    "usage: bench_compare.py --pins [result.json] "
                    "[--threshold FLOAT]"
                )
            del args[i : i + 2]
        result = args[0] if args else os.path.join(ROOT, "bench_result.json")
        raise SystemExit(compare_pins(result, threshold))
    raise SystemExit(duckdb_compare())
