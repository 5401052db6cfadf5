"""Lint: input_hint bans per-row Python UDFs and the RDD API in the
engine (BASELINE.json:15 — 'vectorized pandas/Arrow UDFs (no per-row
Python) throughout'). SURVEY.md §2.B marks F.udf / RDD as banned."""

from __future__ import annotations

import re
from pathlib import Path

FTE = Path(__file__).resolve().parents[1] / "fte"

BANNED = [
    (re.compile(r"\bF\.udf\b|\bfunctions\.udf\b|@udf\b"), "per-row Python UDF"),
    (re.compile(r"\.rdd\b(?!_)"), "RDD API"),
    (re.compile(r"\bsparkContext\.parallelize\b"), "RDD API"),
]


def test_no_banned_apis():
    offenders = []
    for p in FTE.rglob("*.py"):
        src = p.read_text()
        for pat, why in BANNED:
            for m in pat.finditer(src):
                line = src[: m.start()].count("\n") + 1
                offenders.append(f"{p.name}:{line} {why}")
    assert not offenders, offenders
