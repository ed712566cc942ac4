"""Result-sink / report rendering (reference S6: the demo's stdout report,
similarity_search.py:648-738) — driver-side formatting of two SMALL
DataFrames (ranked hits + one stats row). Collecting here is correct by
construction: inputs are top-k and a single aggregate row, never the corpus.

String formatting mirrors the reference's `:.1%` / `:.0f` styles (D5) and
the `Rank {i+1}` numbering (O3) — rank comes from the DataFrame order the
search already guarantees (score desc, id asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _pct(x: float | None) -> str:
    return "n/a" if x is None else f"{x:.1%}"


def _num(x: float | None, nd: int = 0) -> str:
    return "n/a" if x is None else f"{x:.{nd}f}"


def render_search_report(
    hits: DataFrame, stats: DataFrame, *, title: str = "SIMILAR PATIENT SEARCH"
) -> str:
    """Text report over (hits, stats) from
    ``PatientSimilaritySearch.search_with_stats`` — the capability mirror of
    the reference's report block (:648-738)."""
    hit_rows = hits.collect()
    s = stats.head()
    lines = [
        "=" * 60,
        title,
        "=" * 60,
        f"Cohort: {s.total_patients} similar patients "
        f"({s.transplanted} transplanted, {s.not_transplanted} waitlisted)",
        "",
        "Ranked matches:",
    ]
    for i, r in enumerate(hit_rows):
        outcome = "transplanted" if r.received_transplant == 1 else "waitlisted"
        lines.append(
            f"  Rank {i + 1}: {r.patient_id} @ {r.hospital}"
            f"  similarity={r.score:.4f}  [{outcome}]"
        )
    lines += [
        "",
        "Transplant statistics over the cohort:",
        f"  transplant rate:        {_pct(s.transplant_rate)}",
        f"  success rate:           {_pct(s.transplant_success_rate)}",
        f"  avg wait (days):        {_num(s.avg_wait_days)}",
        f"  avg wait (months):      {_num(s.avg_wait_months, 1)}",
        "  waitlist breakdown:     "
        f"active={s.waitlist_active} removed_sick={s.waitlist_removed_sick} "
        f"removed_improved={s.waitlist_removed_improved} deceased={s.waitlist_deceased}",
        "",
        "Successful-transplant cohort profile:",
        f"  avg age:                {_num(s.success_avg_age, 1)}",
        f"  avg MELD:               {_num(s.success_avg_meld, 1)}",
        f"  diabetes prevalence:    {_pct(s.success_diabetes_rate)}",
        "=" * 60,
    ]
    return "\n".join(lines)
