"""Single-node pandas reference throughput on the SAME data the engine
benches (BASELINE.json:2: engine must match-or-beat the reference's
single-node throughput).

The reference's execution model is eager single-node pandas
[U: FeatureHub evaluation path]; fte/pandas_ref.py implements the same
features the engine's library computes. This times that reference on
the sf0.1-scale synthetic transcripts and prints one JSON line to set
the bar bench.py's feature_matrix number is compared against.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fte import pandas_ref as R  # noqa: E402

DATA = "/tmp/fte_bench_transcripts_40000.parquet"


def main() -> int:
    pdf = pd.read_parquet(DATA)
    n = len(pdf)
    t0 = time.time()
    out = R.ref_sessionize(pdf)
    out = R.ref_rolling_counts(out)
    out = R.ref_lag_lead(out)
    out = R.ref_backfill(out, "tool")
    out = R.ref_rolling_text_stats(out)
    out = R.ref_role_freq(out)
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "engine": "pandas-reference-single-node",
                "n_turns": n,
                "wall_s": round(wall, 2),
                "turns_per_sec": round(n / wall, 1),
                "n_feature_cols": len(out.columns) - 6,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
