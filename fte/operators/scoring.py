"""Model-based scoring seam: run an arbitrary batch model over a text
column at corpus scale.

Every production curation pipeline ends with learned filters (fastText
quality/language classifiers, toxicity models, reward models). Those
libraries are not in this sandbox, so — exactly like the multimodal
codec seam (fte/operators/multimodal.py) — the MODEL is pluggable and
the Spark-side contract is real and tested:

- Arrow-batched ``mapInPandas``: the model sees pandas Series of
  ``batch_size`` texts, never one row at a time (input_hint: no
  per-row Python).
- The model loads ONCE PER PYTHON WORKER (lazy module-level cache
  inside the closure), not once per batch — loading a 100 MB
  classifier per batch is the classic 100× regression.
- Only (id, score ...) columns come back; the text is consumed
  worker-side and never re-shipped.
- Deterministic fake model included for tests and offline runs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


def fake_quality_model():
    """Deterministic stand-in classifier: score = fraction of
    distinct words (a real repetition-ish signal, cheap and stable).
    Returns a callable scoring a pandas Series of texts -> Series of
    float64 scores in [0, 1]."""

    def score(texts: pd.Series) -> pd.Series:
        def one(t: str) -> float:
            ws = str(t).lower().split()
            return (len(set(ws)) / len(ws)) if ws else 0.0

        return texts.map(one).astype("float64")

    return score


def score_with_model(
    df: DataFrame,
    model_loader: Callable[[], Callable[[pd.Series], pd.Series]] = fake_quality_model,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "model_score",
    batch_size: int = 1024,
) -> DataFrame:
    """(id, model_score) for every document. ``model_loader`` is
    called lazily AT MOST ONCE per Python worker process (its result
    is cached in the closure), then applied per Arrow batch. Swap
    ``fake_quality_model`` for a real loader::

        score_with_model(docs, lambda: fasttext.load_model(...).predict_wrapper)

    Output grain = input grain; join back on ``id_col`` for payloads
    (the text itself never returns from the workers).
    """
    schema = f"{id_col} long, {out_col} double"
    state: dict = {}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            model = state.get("m")
            if model is None:
                model = state["m"] = model_loader()
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].to_numpy(),
                        out_col: model(chunk[text_col]).to_numpy(),
                    }
                )

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)
