"""Single-node pandas reference implementations (BASELINE.json:6).

The correctness contract: engine outputs must be ``numpy.allclose`` to
these at every (conv_id, turn_idx, ts) key, with byte-equal ``text``,
under stable (conv_id, turn_idx) ordering. These functions are
intentionally written in idiomatic pandas (groupby/shift/ffill/
expanding/merge_asof) — the same surface FeatureHub feature functions
used — and are never called inside Spark jobs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ORDER = ["conv_id", "ts", "turn_idx"]


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(ORDER, kind="mergesort").reset_index(drop=True)


def ref_sessionize(df: pd.DataFrame, gap_seconds: int = 1800) -> pd.DataFrame:
    out = _sorted(df)
    # floor-to-second semantics match Spark's epoch_seconds (long cast)
    es = out["ts"].astype("int64") // 1_000_000
    prev_es = es.groupby(out["conv_id"], sort=False).shift(1)
    is_new = prev_es.isna() | ((es - prev_es) > gap_seconds)
    out["session_id"] = is_new.groupby(out["conv_id"], sort=False).cumsum().astype("int64")
    return out


def ref_rolling_counts(df: pd.DataFrame, last_seconds: int = 300) -> pd.DataFrame:
    out = _sorted(df)
    g = out.groupby("conv_id", sort=False)
    out["turns_so_far"] = g.cumcount() + 1
    # trailing time-range count on floored epoch seconds (matches the
    # Spark rangeBetween(-N, 0) over epoch_seconds)
    es = out["ts"].astype("int64") // 1_000_000
    res = np.empty(len(out), dtype="int64")
    for _, idx in g.indices.items():
        sec = es.iloc[idx].to_numpy()
        order = np.argsort(sec, kind="stable")
        sec_sorted = sec[order]
        lo = np.searchsorted(sec_sorted, sec_sorted - last_seconds, side="left")
        hi = np.searchsorted(sec_sorted, sec_sorted, side="right")
        cnt = hi - lo
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        res[idx] = cnt[inv]
    out["turns_last_300s"] = res
    return out


def ref_lag_lead(df: pd.DataFrame) -> pd.DataFrame:
    out = _sorted(df)
    g = out.groupby("conv_id", sort=False)
    out["lag_role_1"] = g["role"].shift(1)
    out["lead_role_1"] = g["role"].shift(-1)
    es = out["ts"].astype("int64") // 1_000_000
    out["gap_prev_s"] = (es - es.groupby(out["conv_id"]).shift(1)).astype("float64")
    ln = out["text"].str.len()
    out["lag_textlen_1"] = ln.groupby(out["conv_id"], sort=False).shift(1)
    return out


def ref_backfill(df: pd.DataFrame, col: str = "tool") -> pd.DataFrame:
    out = _sorted(df)
    out[f"ffill_{col}"] = out.groupby("conv_id", sort=False)[col].ffill()
    return out


def ref_rolling_text_stats(df: pd.DataFrame) -> pd.DataFrame:
    out = _sorted(df)
    ln = out["text"].str.len().astype("float64")
    g = ln.groupby(out["conv_id"], sort=False)
    out["textlen"] = ln.astype("int64")
    out["textlen_mean"] = g.expanding().mean().reset_index(level=0, drop=True)
    out["textlen_std"] = g.expanding().std(ddof=1).reset_index(level=0, drop=True)
    out["textlen_min"] = g.expanding().min().reset_index(level=0, drop=True).astype("int64")
    out["textlen_max"] = g.expanding().max().reset_index(level=0, drop=True).astype("int64")
    out["textlen_sum"] = g.expanding().sum().reset_index(level=0, drop=True).astype("int64")
    return out


def ref_role_freq(df: pd.DataFrame, roles=("user", "assistant", "system", "tool")) -> pd.DataFrame:
    out = _sorted(df)
    total = out.groupby("conv_id", sort=False).cumcount() + 1
    for r in roles:
        ind = (out["role"] == r).astype("int64")
        cnt = ind.groupby(out["conv_id"], sort=False).cumsum()
        out[f"cnt_{r}"] = cnt
        out[f"frac_{r}"] = cnt / total
    return out


def ref_asof(anchors: pd.DataFrame, turns: pd.DataFrame, right_cols=("turn_idx", "role", "text", "tool", "ts"), prefix="r_") -> pd.DataFrame:
    a = anchors.sort_values(["ts", "anchor_id"], kind="mergesort").copy()
    # normalize BOTH merge keys to us — pd.merge_asof raises MergeError on
    # mixed datetime64 units (us vs ns), and parquet/hypothesis inputs vary
    a["ts"] = a["ts"].astype("datetime64[us]")
    t = turns.sort_values(["ts", "turn_idx"], kind="mergesort").copy()
    t["ts"] = t["ts"].astype("datetime64[us]")
    ren = t.rename(columns={c: prefix + c for c in t.columns if c != "conv_id"})
    keep = ["conv_id"] + [prefix + c for c in right_cols]
    res = pd.merge_asof(
        a, ren[keep], left_on="ts", right_on=prefix + "ts", by="conv_id",
        direction="backward", allow_exact_matches=True,
    )
    return res.sort_values("anchor_id", kind="mergesort").reset_index(drop=True)
