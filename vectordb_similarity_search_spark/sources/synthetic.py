"""Synthetic patients table — the reference's generator (S1-S3,
similarity_search.py:54-166) re-expressed as pure Spark column expressions
over ``spark.range`` (no pandas, no driver loop, generates any N
distributed).

Distribution mapping (SURVEY.md §2.1 S1):
- normal(mu, sd)      → mu + sd * randn(seed)
- exponential(mean)   → -mean * ln(1 - rand(seed))   (inverse CDF)
- binomial(1, p)      → (rand(seed) < p).cast(int)
- clip(lo, hi)        → least(greatest(x, lo), hi)

Determinism: rand(seed) depends on partition layout, so the row count per
partition is pinned (``numPartitions``) — same seed + same N → identical
table on any cluster size. Unlike the reference, dates come from a fixed
base (not wall-clock ``datetime.now()``, similarity_search.py:134) and
missing values are real NULLs, not 0/'N/A' sentinels (:159-164).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURES = [
    "age", "meld_score", "bmi", "creatinine", "bilirubin", "inr",
    "sodium", "albumin", "dialysis", "ascites", "encephalopathy",
    "diabetes", "hypertension", "etiology_alcohol", "etiology_nash",
    "etiology_hcv", "etiology_other", "blood_type_o", "blood_type_a",
    "blood_type_b",
]

BASE_DATE = "2021-01-01"  # fixed, not wall-clock (reference :134 quirk fixed)


def _clip(c: Column, lo: float, hi: float) -> Column:
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))


def _normal(mu: float, sd: float, lo: float, hi: float, seed: int) -> Column:
    return _clip(F.lit(mu) + F.lit(sd) * F.randn(seed), lo, hi)


def _exponential(mean: float, lo: float, hi: float, seed: int) -> Column:
    return _clip(-F.lit(mean) * F.log(F.lit(1.0) - F.rand(seed)), lo, hi)


def _binomial(p: float, seed: int) -> Column:
    return (F.rand(seed) < p).cast("int")


def gen_patients(
    spark: SparkSession,
    n: int = 1000,
    hospital: str = "Hospital_A",
    seed: int = 42,
    num_partitions: int = 8,
) -> DataFrame:
    """One hospital's patients table (schema per FIXTURES.md §B).

    Feature distributions cite the reference generator
    (similarity_search.py:59-80); outcomes cite :93-166.
    """
    s = seed * 1000  # seed namespace per hospital
    df = spark.range(0, n, 1, num_partitions).select(
        F.format_string("PT_%06d", F.col("id")).alias("patient_id"),  # :83
        F.lit(hospital).alias("hospital"),
        _normal(55, 15, 18, 80, s + 1).alias("age"),                  # :60
        _exponential(15, 6, 40, s + 2).alias("meld_score"),           # :61
        _normal(27, 5, 18, 45, s + 3).alias("bmi"),                   # :62
        _exponential(1.2, 0.5, 8, s + 4).alias("creatinine"),         # :63
        _exponential(5, 0.3, 50, s + 5).alias("bilirubin"),           # :64
        _exponential(1.8, 0.8, 6, s + 6).alias("inr"),                # :65
        _normal(138, 5, 125, 150, s + 7).alias("sodium"),             # :66
        _normal(3.2, 0.8, 1.5, 5, s + 8).alias("albumin"),            # :67
        _binomial(0.15, s + 9).alias("dialysis"),                     # :68
        _binomial(0.40, s + 10).alias("ascites"),                     # :69
        _binomial(0.25, s + 11).alias("encephalopathy"),              # :70
        _binomial(0.30, s + 12).alias("diabetes"),                    # :71
        _binomial(0.45, s + 13).alias("hypertension"),                # :72
        _binomial(0.30, s + 14).alias("etiology_alcohol"),            # :73
        _binomial(0.25, s + 15).alias("etiology_nash"),               # :74
        _binomial(0.20, s + 16).alias("etiology_hcv"),                # :75
        _binomial(0.25, s + 17).alias("etiology_other"),              # :76
        _binomial(0.45, s + 18).alias("blood_type_o"),                # :77
        _binomial(0.40, s + 19).alias("blood_type_a"),                # :78
        _binomial(0.15, s + 20).alias("blood_type_b"),                # :79
    )

    # Outcome generation (S3, :93-166): derived transplant probability from
    # MELD severity discounted by age (P2, :98-109), then conditional
    # outcome columns (P3, :115-156) with real NULLs for the
    # not-applicable branches.
    meld_factor = (F.col("meld_score") - 6) / 34                      # :99
    age_factor = 1 - ((F.col("age") - 18) / 62) * 0.3                 # :100
    tx_prob = _clip(meld_factor * age_factor * 0.8 + 0.1, 0.05, 0.95)  # :108-109
    df = df.withColumn("received_transplant", (F.rand(s + 21) < tx_prob).cast("int"))  # :112

    tx = F.col("received_transplant") == 1
    success_prob = _clip(
        F.lit(0.85) - meld_factor * 0.2 - (F.col("age") - 50) / 100 * 0.1, 0.5, 0.95
    )  # :124-130
    df = (
        df.withColumn(
            "days_to_transplant",
            F.when(tx, _exponential(120, 1, 1000, s + 22)),           # :120; NULL else (:159 fixed)
        )
        .withColumn(
            "transplant_success",
            F.when(tx, (F.rand(s + 23) < success_prob).cast("int")),  # :131
        )
        .withColumn(
            "transplant_date",
            F.when(
                tx,
                F.date_add(
                    F.lit(BASE_DATE).cast("date"),
                    (F.rand(s + 24) * 1825).cast("int"),
                ),
            ),                                                        # :134-139, date not string
        )
        .withColumn(
            "follow_up_days",
            F.when(tx, _exponential(400, 30, 1800, s + 25)),          # :142
        )
        .withColumn(
            "days_on_waitlist",
            F.when(~tx, _exponential(200, 1, 2000, s + 26)),          # :150
        )
        .withColumn(
            "waitlist_status",
            F.when(
                ~tx,
                # choice p=[.6,.2,.1,.1] (:153-156) via CDF thresholds
                F.when(F.rand(s + 27) < 0.6, 0)
                .when(F.rand(s + 27) < 0.8, 1)
                .when(F.rand(s + 27) < 0.9, 2)
                .otherwise(3),
            ),
        )
    )
    return df


def gen_hospital_patients(
    spark: SparkSession,
    hospital_configs: dict[str, int] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Multi-silo patients table — the reference demo's three hospitals
    (similarity_search.py:592-596) as ONE DataFrame with a ``hospital``
    partition column. Unlike the reference (which reuses the same seed per
    hospital, colliding patient ids AND feature rows across silos, :56/:83),
    each hospital gets its own seed namespace."""
    hospital_configs = hospital_configs or {
        "Hospital_A": 50_000, "Hospital_B": 40_000, "Hospital_C": 60_000
    }
    out: DataFrame | None = None
    for i, (name, n) in enumerate(sorted(hospital_configs.items())):
        part = gen_patients(spark, n, name, seed=seed + i)
        out = part if out is None else out.unionByName(part)
    return out
