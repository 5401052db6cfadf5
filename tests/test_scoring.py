"""Model-scoring seam: batch contract, one-load-per-worker caching,
deterministic fake model parity."""

from __future__ import annotations

import pandas as pd

from fte.operators.scoring import fake_quality_model, score_with_model


def test_score_matches_direct_model(spark):
    texts = [
        "the quick brown fox",          # 4/4 distinct
        "buy now buy now buy now",      # 2/6
        "",                             # empty -> 0.0
        "solo",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(4), "text": texts})
    )
    got = (
        score_with_model(docs, batch_size=2)
        .orderBy("doc_id")
        .toPandas()
    )
    model = fake_quality_model()
    expect = model(pd.Series(texts))
    assert got["model_score"].tolist() == expect.tolist()
    assert got["model_score"].tolist() == [1.0, 2 / 6, 0.0, 1.0]


def test_model_loads_once_per_worker(spark):
    """model_loader must be invoked at most once per Python worker —
    loading per batch OR PER TASK is the classic 100x regression.
    Counted via a worker-side marker file per invocation. Uses MORE
    partitions (12) than cores so reused workers run several tasks
    each: a per-task (closure-local) cache would load 12 times and
    fail the len(loads) == len(pids) assertion; the module-level
    cache loads once per distinct worker pid."""
    import glob
    import uuid

    n_cores = 4  # conftest spark fixture is local[4]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(2000), "text": ["a b c"] * 2000})
    ).repartition(12)

    marker = "/tmp/fte_model_loads"

    def counting_loader():
        import os

        os.makedirs(marker, exist_ok=True)
        # one file per invocation, named by pid + nonce
        open(f"{marker}/{os.getpid()}_{uuid.uuid4().hex}", "w").close()
        return fake_quality_model()

    import shutil

    shutil.rmtree(marker, ignore_errors=True)
    # fresh cache key per run: reused workers keep the module cache
    # alive across tests, which would otherwise hide the loader call
    out = score_with_model(docs, counting_loader, batch_size=64,
                           cache_key=f"test_{uuid.uuid4().hex}")
    assert out.count() == 2000
    loads = glob.glob(f"{marker}/*")
    pids = {f.rsplit("/", 1)[1].split("_")[0] for f in loads}
    # exactly one load per distinct worker pid, never one per task:
    # 12 tasks on <= n_cores workers must not produce 12 loads
    assert len(loads) == len(pids)
    assert 1 <= len(loads) <= n_cores < 12


def test_distinct_lambdas_do_not_share_cache(spark):
    """Regression: the default cache key is content-addressed
    (cloudpickle sha256), so two different lambdas in one application
    must score with their OWN models — module.qualname keying made
    them collide ('<lambda>') and silently reuse the first model."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(8), "text": ["a b c"] * 8})
    ).repartition(2)

    def loader_const(v):
        return lambda: (lambda texts: pd.Series([v] * len(texts), dtype="float64"))

    a = score_with_model(docs, loader_const(1.0)).toPandas()
    b = score_with_model(docs, loader_const(2.0)).toPandas()
    assert set(a["model_score"]) == {1.0}
    assert set(b["model_score"]) == {2.0}
