from __future__ import annotations

import numpy as np
import pandas as pd

KEY = ["conv_id", "turn_idx"]


def aligned(spark_pdf: pd.DataFrame, ref_pdf: pd.DataFrame, cols: list[str]):
    """Sort both frames by (conv_id, turn_idx) and return col pairs."""
    a = spark_pdf.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    b = ref_pdf.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}"
    return [(c, a[c], b[c]) for c in cols]


def assert_allclose_frames(spark_pdf, ref_pdf, cols, rtol=1e-9, atol=1e-12):
    """The spec'd parity check: allclose per key for numerics,
    exact equality for everything else (BASELINE.json:6,15)."""
    for c, x, y in aligned(spark_pdf, ref_pdf, cols):
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xa = x.to_numpy(dtype="float64", na_value=np.nan)
            ya = y.to_numpy(dtype="float64", na_value=np.nan)
            ok = np.isclose(xa, ya, rtol=rtol, atol=atol) | (np.isnan(xa) & np.isnan(ya))
        else:
            xs = x.astype("object").where(x.notna(), None)
            ys = y.astype("object").where(y.notna(), None)
            ok = np.array([u == v or (u is None and v is None) for u, v in zip(xs, ys)])
        assert ok.all(), (
            f"column {c}: {np.count_nonzero(~ok)} mismatches; "
            f"first bad idx {int(np.argmax(~ok))}: "
            f"{x.iloc[int(np.argmax(~ok))]!r} vs {y.iloc[int(np.argmax(~ok))]!r}"
        )
