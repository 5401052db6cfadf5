"""The conv_id Exchange must not carry the fat text column: scalar
extractors are ordered below the windows so Catalyst prunes text at
the scan (SURVEY.md §4 'column pruning — crucial')."""

from __future__ import annotations

import contextlib
import io
import re

from fte.features import build_default_registry
from fte.pipeline import build_matrix


def test_exchange_excludes_text(spark, transcripts_df):
    reg = build_default_registry()
    mat = build_matrix(transcripts_df, reg, serve=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mat.explain("formatted")
    txt = buf.getvalue()
    m = re.search(r"\((\d+)\) Exchange\n(.*?)\n\n", txt, re.S)
    assert m, "no Exchange in plan"
    exchange_input = m.group(2).split("Arguments")[0]
    assert re.search(r"\btext#", exchange_input) is None, exchange_input
