#!/usr/bin/env python
"""Poisson bootstrap at scale: 10M synthetic fact rows x 100 replicates
(1B weighted contributions) under a vanilla SparkSession.

What it proves (the 100 TB claims in plans/relational_queries.r_bootstrap_ci):

- the 100x replicate expansion is MAP-SIDE compute: the only exchange
  carries (group, replicate) partials (groups x 100 rows), never the
  expanded rows — asserted from the plan (exactly one Exchange below the
  replicate aggregate);
- the per-row hash work parallelizes (the widen + own-projection fix:
  inlined into the 9-branch CASE on a single-input-split scan it ran 9x
  per row on one task);
- statistical sanity: each group's 95% CI brackets the group's exact
  SAMPLE mean (the bootstrap distribution's center — a 95% CI is
  entitled to miss the generator's true mean ~5% of the time, so THAT
  is reported, not asserted), and the CI width shrinks roughly as
  1/sqrt(n) vs a 100x smaller run;
- wall time for the end-to-end readout.

    python scripts/scale_smoke_bootstrap.py        # 10M rows, ~1-2 min
    SMOKE_ROWS=40000000 python scripts/...         # bigger run
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from vectordb_similarity_search_spark.plans.relational_queries import (  # noqa: E402
    _POIS1_CDF,
)
from vectordb_similarity_search_spark.session import get_spark  # noqa: E402

N_ROWS = int(os.environ.get("SMOKE_ROWS", 10_000_000))
B = 100


def main() -> None:
    spark = get_spark(app_name="smoke-bootstrap")

    # 4 groups with KNOWN means: value = group*1000 + uniform(0, 100)
    # (hash-uniform, deterministic) -> true mean = group*1000 + ~50
    base = spark.range(N_ROWS).select(
        F.col("id"),
        (F.col("id") % 4).cast("int").alias("grp"),
        (
            (F.col("id") % 4) * 1000
            + (F.pmod(F.xxhash64("id"), F.lit(100_000)) / 1000.0)
        ).alias("value"),
    )

    def ci(df, label):
        reps = df.select(
            "grp",
            "value",
            F.explode(F.sequence(F.lit(1), F.lit(B))).alias("b"),
            "id",
        ).select(
            "grp",
            "value",
            "b",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("id").cast("string"),
                                F.lit(":"),
                                F.col("b").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                / 4294967296.0
            ).alias("u"),
        )
        wt = F.lit(8)
        for k in range(len(_POIS1_CDF) - 1, -1, -1):
            wt = F.when(F.col("u") < _POIS1_CDF[k], F.lit(k)).otherwise(wt)
        w = reps.select("grp", "b", "value", wt.alias("wt"))
        rep_means = (
            w.groupBy("grp", "b")
            .agg(
                F.sum(F.col("wt") * F.col("value")).alias("swv"),
                F.sum("wt").alias("sw"),
            )
            .filter(F.col("sw") > 0)
            .select(
                "grp", "b", (F.col("swv") / F.col("sw")).alias("m")
            )
        )
        from pyspark.sql import Window

        wr = Window.partitionBy("grp").orderBy("m", "b")
        ranked = rep_means.select(
            "grp", "m", F.row_number().over(wr).alias("r")
        )
        t0 = time.time()
        rows = (
            ranked.filter(F.col("r").isin(3, 98))
            .groupBy("grp")
            .agg(
                F.min(F.when(F.col("r") == 3, F.col("m"))).alias("lo"),
                F.min(F.when(F.col("r") == 98, F.col("m"))).alias("hi"),
            )
            .collect()
        )
        wall = time.time() - t0
        out = {r.grp: (r.lo, r.hi) for r in rows}
        print(f"  {label}: CI compute {wall:.1f}s", flush=True)
        return out, w

    big, w_big = ci(base, f"{N_ROWS:,} rows x {B} replicates")
    sample_means = {
        r.grp: r.m
        for r in base.groupBy("grp").agg(F.avg("value").alias("m")).collect()
    }
    for g, (lo, hi) in sorted(big.items()):
        sm = sample_means[g]
        true_mean = g * 1000 + 49.9995  # E[pmod/1000] over 0..99999
        # Bracketing the sample mean is overwhelmingly likely at the
        # default 10M rows but NOT a guaranteed invariant of a 3rd/98th
        # percentile CI, so it is a hard assert only at >= the default
        # size; a small SMOKE_ROWS override downgrades it to a reported
        # warning (like the true-mean coverage check) instead of flaking.
        brackets = lo <= sm <= hi
        if N_ROWS >= 10_000_000:
            assert brackets, (
                f"group {g}: sample mean {sm} outside CI [{lo}, {hi}]"
            )
        elif not brackets:
            print(
                f"  WARNING group {g}: sample mean {sm} outside CI "
                f"[{lo}, {hi}] (non-default SMOKE_ROWS={N_ROWS}; "
                "percentile CIs may legitimately miss at small n)",
                flush=True,
            )
        print(
            f"  group {g}: CI [{lo:.3f}, {hi:.3f}] "
            f"{'brackets' if brackets else 'MISSES'} sample mean "
            f"{sm:.3f} (width {hi - lo:.3f}; generator true "
            f"{true_mean:.4f} {'covered' if lo <= true_mean <= hi else 'missed — the ~5%'})",
            flush=True,
        )

    # plan shape: the replicate expansion must NOT reach the exchange —
    # exactly one shuffle below the (grp, b) aggregate, fed by a partial
    from tests.conftest import plan_of

    p = plan_of(
        w_big.groupBy("grp", "b").agg(F.sum("wt").alias("s"))
    )
    n_exchanges = p.count("Exchange (")  # tree lines only (round-4 lesson)
    assert n_exchanges == 1, f"expected 1 exchange, saw {n_exchanges}:\n{p}"
    assert "partial_sum" in p, p  # map-side combine absorbs the 100x rows
    # the explode sits BELOW the partial aggregate, not above the shuffle
    tree = p.split("(1)")[0]
    assert tree.index("Generate") > tree.index("Exchange"), tree
    print("  plan: ONE exchange, map-side partials absorb the 100x "
          "expansion OK", flush=True)

    # 1/sqrt(n) sanity: a 100x smaller corpus gives ~10x wider CIs
    small, _ = ci(
        base.filter(F.col("id") < N_ROWS // 100), f"{N_ROWS // 100:,} rows"
    )
    wide = sum(hi - lo for lo, hi in small.values())
    narrow = sum(hi - lo for lo, hi in big.values())
    ratio = wide / narrow
    assert 5.0 < ratio < 20.0, (
        f"CI width ratio {ratio:.1f} not ~10x for 100x fewer rows"
    )
    print(f"  CI width ratio small/large = {ratio:.1f} (~10 expected)",
          flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
