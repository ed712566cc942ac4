#!/usr/bin/env python
"""Drive the STATEFUL streaming operators under a VANILLA SparkSession —
not the pytest session — replaying the driver fixtures through rate-limited
file-source micro-batches, and assert equality against their batch twins.

Round-4 motivation (VERDICT item 5): the round-3 NANOS→NTZ break proved
that session-conf assumptions invisible to the test session surface the
moment a plain ``SparkSession.builder`` drives the same code. The batch
twins are oracle-green every round; this smoke gives the stream-only paths
(applyInPandasWithState near-dup, foreachBatch rollup ingest, windowed
counts) the same out-of-session treatment.

    python scripts/scale_smoke_streaming.py   # ~1-2 min, exits 1 on FAIL
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
N_CHUNKS = 8  # micro-batches per replay (maxFilesPerTrigger=1)

failures: list[str] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)
    if not ok:
        failures.append(name)


def chunked_replay_dir(spark, src_df, out_dir: str) -> None:
    """Split a fixture table into N parquet files so a file-source stream
    with maxFilesPerTrigger=1 replays it as N micro-batches."""
    src_df.repartition(N_CHUNKS).write.mode("overwrite").parquet(out_dir)


def time_ordered_replay_dir(spark, src_df, ts_col: str, out_dir: str) -> None:
    """Split a timestamped table into N TIME-ORDERED slice files, written
    oldest-first (the file source processes oldest-modified first), so the
    replay respects event time and the watermark never spuriously drops a
    whole out-of-order chunk — replaying a historical table as a stream
    must present it the way the stream would have arrived."""
    import time as _time

    from pyspark.sql import functions as F

    qs = [i / N_CHUNKS for i in range(1, N_CHUNKS)]
    cuts = src_df.select(
        F.col(ts_col).cast("double").alias("_t")
    ).approxQuantile("_t", qs, 0.001)
    bounds = [float("-inf"), *cuts, float("inf")]
    os.makedirs(out_dir, exist_ok=True)
    import glob as _glob

    for i in range(N_CHUNKS):
        lo, hi = bounds[i], bounds[i + 1]
        t = F.col(ts_col).cast("double")
        sl = src_df.where((t >= lo) & (t < hi)) if hi != float("inf") else (
            src_df.where(t >= lo)
        )
        tmp = os.path.join(out_dir, f"_build_{i:02d}")
        sl.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, os.path.join(out_dir, f"slice_{i:02d}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
        _time.sleep(0.05)  # distinct mtimes -> deterministic replay order


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vectordb_similarity_search_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from vectordb_similarity_search_spark.operators.rollup import (
        hourly_rollup,
        read_rollup,
    )
    from vectordb_similarity_search_spark.sources.tables import load_table
    from vectordb_similarity_search_spark.streaming.events import (
        neardup_pairs_stream,
        rollup_ingest_stream,
        tumbling_counts_stream,
    )

    # vanilla builder on purpose: no confs from session.get_spark —
    # whatever the operators need must be set by the library at runtime
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("scale-smoke-streaming")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="smoke_stream_")
    try:
        events = load_table(spark, SF_DIR, "events")
        docs = load_table(spark, SF_DIR, "documents")

        # ---- 1. tumbling hourly counts: stream replay == batch twin ----
        ev_dir = os.path.join(work, "events_chunks")
        time_ordered_replay_dir(spark, events, "ts", ev_dir)
        ev_stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_dir)
        )
        out = tumbling_counts_stream(ev_stream)
        q = (
            out.writeStream.format("memory")
            .queryName("smoke_tumbling")
            .outputMode("append")
            .option(
                "checkpointLocation", os.path.join(work, "ck_tumbling")
            )
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = spark.sql(
            "SELECT win_start AS ws, event_type, n_events AS n "
            "FROM smoke_tumbling"
        )
        # the stream's append mode only emits watermark-closed windows;
        # batch twin restricted to the emitted window set must MATCH
        batch = (
            events.groupBy(
                F.window("ts", "1 hour").alias("window"), "event_type"
            )
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("ws"), "event_type", "n")
        )
        emitted = {(r.ws, r.event_type): r.n for r in got.collect()}
        expected = {(r.ws, r.event_type): r.n for r in batch.collect()}
        wrong = {
            k: (v, expected.get(k)) for k, v in emitted.items()
            if expected.get(k) != v
        }
        check(
            "tumbling_stream_subset_matches_batch",
            len(emitted) > 0 and not wrong,
            f"emitted={len(emitted)} mismatches={len(wrong)}",
        )

        # ---- 2. stateful streaming near-dup: candidates cover the batch
        # pairs (batch exact-verifies J>=0.7; the stream estimates from
        # signatures, so drive it at a lower screen threshold) ----
        docs_dir = os.path.join(work, "docs_chunks")
        chunked_replay_dir(spark, docs.select("doc_id", "text"), docs_dir)
        d_stream = (
            spark.readStream.schema(docs.select("doc_id", "text").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(docs_dir)
        )
        pairs_out = neardup_pairs_stream(
            d_stream, n_hashes=16, bands=4, threshold=0.4
        )
        q2 = (
            pairs_out.writeStream.format("memory")
            .queryName("smoke_neardup")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ck_neardup"))
            .start()
        )
        q2.processAllAvailable()
        q2.stop()
        stream_pairs = {
            tuple(sorted((r.id_new, r.id_seen)))
            for r in spark.sql(
                "SELECT id_new, id_seen FROM smoke_neardup"
            ).collect()
        }
        batch_pairs = {
            tuple(sorted((r.id_a, r.id_b)))
            for r in minhash_lsh_pairs(
                docs, threshold=0.7, bands=4, n_hashes=16
            ).collect()
        }
        missing = batch_pairs - stream_pairs
        check(
            "neardup_stream_covers_batch_pairs",
            len(batch_pairs) > 0 and not missing,
            f"batch={len(batch_pairs)} stream={len(stream_pairs)} "
            f"missing={len(missing)}",
        )

        # ---- 3. foreachBatch rollup ingest == one-shot batch rollup ----
        rollup_path = os.path.join(work, "rollup")
        q3 = rollup_ingest_stream(
            ev_stream, rollup_path, os.path.join(work, "ck_rollup")
        )
        q3.processAllAvailable()
        q3.stop()
        inc = read_rollup(spark, rollup_path)
        one_shot = hourly_rollup(events)

        def canon(df):
            # partial-merge order differs from the one-shot fold, so the
            # double sums agree to float error, not bit-for-bit
            cols = [
                F.round(F.col(f.name), 6).alias(f.name)
                if f.dataType.simpleString() == "double"
                else F.col(f.name)
                for f in one_shot.schema.fields
            ]
            return {tuple(r) for r in df.select(*cols).collect()}

        a, b = canon(inc), canon(one_shot)
        check(
            "rollup_ingest_stream_matches_one_shot",
            len(b) > 0 and a == b,
            f"stream_rows={len(a)} batch_rows={len(b)}",
        )
        # ---- 4. vector ingest stream: live index == batch-built ----
        from vectordb_similarity_search_spark.operators.ann import (
            ivf_fit,
            ivf_search_index,
            ivf_write_index,
        )
        from vectordb_similarity_search_spark.streaming.vectors import (
            vector_ingest_stream,
        )

        emb = load_table(spark, SF_DIR, "embeddings")
        model = ivf_fit(emb, n_cells=8, seed=5)
        vec_idx = os.path.join(work, "vecidx")
        ivf_write_index(model, emb.filter(F.col("vec_id") < 100), vec_idx)
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]

        vsrc = os.path.join(work, "vec_chunks")
        os.makedirs(vsrc)
        # batch 1: insert 100-299; batch 2: insert the rest + delete 2 ids
        emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 300)).withColumn(
            "_del", F.lit(False)
        ).coalesce(1).write.mode("append").parquet(vsrc)
        q = vector_ingest_stream(
            spark.readStream.schema(
                "vec_id long, embedding array<float>, label int, _del boolean"
            ).parquet(vsrc),
            model, vec_idx, os.path.join(work, "vec_chk"),
            delete_col="_del", compact_every=2, target_rows_per_file=100_000,
        )
        try:
            q.processAllAvailable()
            emb.filter(F.col("vec_id") >= 300).withColumn(
                "_del", F.lit(False)
            ).unionByName(
                emb.filter(F.col("vec_id").isin([7, 11])).withColumn(
                    "_del", F.lit(True)
                )
            ).coalesce(1).write.mode("append").parquet(vsrc)
            q.processAllAvailable()
        finally:
            q.stop()
        batch_idx = os.path.join(work, "vecidx_batch")
        ivf_write_index(model, emb.filter(~F.col("vec_id").isin([7, 11])), batch_idx)
        live = ivf_search_index(spark, vec_idx, model, qv, k=10, nprobe=8).collect()
        want = ivf_search_index(spark, batch_idx, model, qv, k=10, nprobe=8).collect()
        check(
            "vector_ingest_stream_matches_batch_index",
            [(r.vec_id, r.score) for r in live] == [(r.vec_id, r.score) for r in want]
            and not os.path.isdir(os.path.join(vec_idx, "_tombstones")),
            f"live_top={[r.vec_id for r in live][:3]}",
        )
        # ---- 5. stateful last-touch attribution: replaying the fixture
        # log in time order must emit exactly the batch twin's per-purchase
        # credits (state carries touches across micro-batch boundaries) ----
        from pyspark.sql import Window

        from vectordb_similarity_search_spark.streaming.events import (
            attribution_stream,
        )

        attr = attribution_stream(
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_dir)
        )
        q5 = (
            attr.writeStream.format("memory")
            .queryName("smoke_attr")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ck_attr"))
            .start()
        )
        q5.processAllAvailable()
        q5.stop()
        emitted_rows = spark.sql(
            "SELECT event_id, channel, value FROM smoke_attr"
        ).collect()
        got_credits = {
            r.event_id: (r.channel, round(r.value, 6)) for r in emitted_rows
        }
        # a dict would silently collapse a double-emit (replay regression);
        # count rows BEFORE keying
        n_dup_emits = len(emitted_rows) - len(got_credits)
        wtouch = (
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        touch = F.last(
            F.when(
                F.col("event_type").isin("view", "click"), F.col("event_type")
            ),
            ignorenulls=True,
        ).over(wtouch)
        want_credits = {
            r.event_id: (r.channel, round(r.value, 6))
            for r in events.select(
                "event_id", "event_type", "value", touch.alias("touch")
            )
            .where(F.col("event_type") == "purchase")
            .select(
                "event_id",
                F.coalesce("touch", F.lit("unattributed")).alias("channel"),
                "value",
            )
            .collect()
        }
        bad = {
            k: (v, want_credits.get(k))
            for k, v in got_credits.items()
            if want_credits.get(k) != v
        }
        check(
            "attribution_stream_matches_batch_twin",
            len(want_credits) > 0
            and n_dup_emits == 0
            and len(got_credits) == len(want_credits)
            and not bad,
            f"purchases={len(want_credits)} emitted={len(emitted_rows)} "
            f"dup_emits={n_dup_emits} mismatches={len(bad)}",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # ------------------------------------------------------------------
    # 6. semantic_cache_stream: injected near-dup queries across
    #    micro-batches under THIS vanilla session — every exact-miner
    #    (earlier, later) pair at the cache threshold is flagged.
    # ------------------------------------------------------------------
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vectordb_similarity_search_spark.operators.dedup import (
        embedding_neardup_blocked,
    )
    from vectordb_similarity_search_spark.streaming.vectors import (
        semantic_cache_stream,
    )

    work = tempfile.mkdtemp(prefix="smoke_semcache_")
    try:
        rng = np.random.default_rng(5)
        dim = 32
        n = 2000
        base = rng.standard_normal((n, dim))
        rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
        for j in range(40):  # 2% later near-dup queries
            src = int(rng.integers(0, n))
            noisy = base[src] + rng.standard_normal(dim) * 1e-3
            rows.append((10_000 + j, [float(x) for x in noisy]))
        schema = "vec_id long, embedding array<double>"
        batch_df = spark.createDataFrame(rows, schema)
        truth = {
            (int(r["id_b"]), int(r["id_a"]))
            for r in embedding_neardup_blocked(
                batch_df, threshold=0.98, n_blocks=4
            ).collect()
            if int(r["id_b"]) >= 10_000
        }
        indir = os.path.join(work, "in")
        os.makedirs(indir)

        def wbatch(sl, nm):
            pdf = pd.DataFrame(sl, columns=["vec_id", "embedding"])
            pq.write_table(
                pa.Table.from_pandas(pdf, preserve_index=False),
                os.path.join(indir, f"{nm}.parquet"),
            )

        wbatch(rows[: n // 2], "b0")
        stream = spark.readStream.schema(schema).parquet(indir)
        name = "smoke_semcache"
        q = (
            semantic_cache_stream(stream, dim=dim, threshold=0.98)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            wbatch(rows[n // 2 : n], "b1")
            q.processAllAvailable()
            wbatch(rows[n:], "b2")
            q.processAllAvailable()
            flagged = {
                (int(r["vec_id"]), int(r["cache_id"]))
                for r in spark.sql(f"SELECT * FROM {name}").collect()
            }
        finally:
            q.stop()
        missing = truth - flagged
        check(
            "semantic_cache_stream_covers_exact_truth",
            len(truth) >= 35 and not missing,
            f"truth={len(truth)} flagged={len(flagged)} missing={len(missing)}",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(f"{'OK' if not failures else 'FAILED'} ({6 - len(failures)}/6)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
