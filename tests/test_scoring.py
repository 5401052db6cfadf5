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
    # THE invariant: exactly one load per distinct worker pid, never
    # one per task. (No upper bound on the pid count: Spark's
    # worker-reuse pool can hold more idle workers than cores after
    # earlier pandas-UDF tests, so in a full-suite run all 12 tasks
    # may land on 12 distinct reused workers — n_cores is not a cap.)
    assert len(loads) == len(pids)
    assert 1 <= len(loads) <= 12


def test_sequential_models_each_load_once_per_worker(spark):
    """Eviction must not thrash normal pipelines: two sequential jobs
    with DIFFERENT models each load exactly once per worker pid —
    the second model does not evict the first mid-job, and neither
    job reloads per task."""
    import glob
    import shutil
    import uuid

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(1000), "text": ["x y z"] * 1000})
    ).repartition(8)

    marker = "/tmp/fte_model_loads_seq"

    def make_loader(tag):
        def loader():
            import os

            os.makedirs(marker, exist_ok=True)
            open(f"{marker}/{tag}_{os.getpid()}_{uuid.uuid4().hex}", "w").close()
            return fake_quality_model()

        return loader

    shutil.rmtree(marker, ignore_errors=True)
    run_id = uuid.uuid4().hex
    for tag in ("m1", "m2"):
        out = score_with_model(docs, make_loader(tag), cache_key=f"{tag}_{run_id}")
        assert out.count() == 1000
    for tag in ("m1", "m2"):
        loads = glob.glob(f"{marker}/{tag}_*")
        pids = {f.rsplit("/", 1)[1].split("_")[1] for f in loads}
        assert len(loads) == len(pids), f"{tag} reloaded within a worker"
        assert len(loads) >= 1


def test_model_cache_lru_eviction():
    """Worker-side cache is bounded: inserting more than
    _MODEL_CACHE_MAX distinct keys evicts the least-recently-used,
    and a cache hit refreshes recency."""
    import fte.operators.scoring as scoring

    saved = dict(scoring._MODEL_CACHE)
    scoring._MODEL_CACHE.clear()
    try:
        loads = []
        for i in range(scoring._MODEL_CACHE_MAX + 2):
            scoring._cache_get_or_load(f"k{i}", lambda i=i: loads.append(i) or f"model{i}")
        assert len(scoring._MODEL_CACHE) == scoring._MODEL_CACHE_MAX
        assert "k0" not in scoring._MODEL_CACHE and "k1" not in scoring._MODEL_CACHE
        # hit refreshes recency: k2 survives the next eviction, k3 goes
        scoring._cache_get_or_load("k2", lambda: loads.append("reload") or "m")
        assert "reload" not in loads, "hit must not reload"
        scoring._cache_get_or_load("new", lambda: "m_new")
        assert "k2" in scoring._MODEL_CACHE and "k3" not in scoring._MODEL_CACHE
    finally:
        scoring._MODEL_CACHE.clear()
        scoring._MODEL_CACHE.update(saved)


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
