#!/usr/bin/env python
"""Run every scale smoke in sequence and print one summary line each —
the round-closing evidence pass. Each smoke is a separate process (its
own SparkSession) and prints its own JSON result line; this runner
records pass/fail and wall per smoke and exits nonzero if any failed.

    python scripts/run_all_smokes.py            # full pass, ~20 min
    python scripts/run_all_smokes.py fast       # skip the two heaviest
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

SMOKES = [
    # (script, heavy)
    ("scale_smoke_streaming.py", False),  # stateful ops, vanilla session
    ("scale_smoke_merge.py", False),      # pruned vs full MERGE
    ("scale_smoke_skew.py", False),       # 10M-row salted-join routing
    ("scale_smoke_rollup.py", False),     # incremental rollup maintenance
    ("scale_smoke_decontam.py", False),   # decontamination at scale
    ("scale_smoke_lakehouse.py", False),  # zone-map pruning + compaction
    ("scale_smoke_heavyhitters.py", False),  # 20M-row MG+recount vs groupBy
    ("scale_smoke_ranking.py", False),    # 5M-row distributed global ranks
    ("scale_smoke_graph.py", False),      # 2M-edge integer PageRank
    ("scale_smoke_knngraph.py", False),   # 100k-vector exact mutual kNN graph
    ("scale_smoke_als.py", False),        # 600k-rating distributed ALS
    ("scale_smoke_ppjoin.py", False),     # 100k-doc EXACT similarity join
    ("scale_smoke_linkage.py", False),    # 350k-name entity resolution
    ("scale_smoke_ivf_drift.py", False),  # drift -> recluster maintenance
    ("scale_smoke_bootstrap.py", False),  # 10M-row Poisson bootstrap CIs
    ("scale_smoke_sketches.py", False),   # 20M-row HLL ledger vs exact
    ("scale_smoke_ann_batch.py", True),   # 1M-vector batch ANN serving
    ("scale_smoke_search.py", True),      # 1M-vector filtered/range/MMR/delete
    ("scale_smoke_incremental.py", True), # 400k-corpus incremental dedup
    ("scale_smoke_text.py", True),        # 100k/500k-doc dedup pipeline
    ("scale_smoke_invindex.py", True),    # 500k-doc inverted-index serving
    ("scale_smoke_curation.py", True),    # 500k-doc end-to-end curation
    ("scale_smoke.py", True),             # 1M vectors + 5M patients
]


def main() -> None:
    fast = len(sys.argv) > 1 and sys.argv[1] == "fast"
    failures = []
    for script, heavy in SMOKES:
        if fast and heavy:
            print(f"SKIP  {script} (fast mode)")
            continue
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, script)],
            capture_output=True,
            text=True,
        )
        wall = time.time() - t0
        tail = (proc.stdout.strip().splitlines() or ["<no output>"])[-1]
        status = "PASS" if proc.returncode == 0 else "FAIL"
        print(f"{status}  {script:32s} {wall:6.1f}s  {tail[:160]}", flush=True)
        if proc.returncode != 0:
            failures.append(script)
            err = (proc.stderr.strip().splitlines() or [""])[-1]
            print(f"      stderr: {err[:200]}")
    print(f"{'OK' if not failures else 'FAILED'} "
          f"({len(SMOKES) - len(failures)}/{len(SMOKES)})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
