"""Behavioral / longitudinal analytics over event streams: funnel
conversion, cohort retention, per-entity autocorrelation.

These are the classic product-analytics operators a warehouse engine
must cover (the reference's user-study features are exactly this
shape: "did the user convert", "is the user still active", "is the
signal self-correlated"). All built-in-function codegen; every shuffle
is on the entity key the rest of the feature pass already uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def funnel_conversion(
    df: DataFrame,
    steps: Sequence[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: for each entity, step k counts as reached only
    at the FIRST time its event occurs STRICTLY AFTER the time step
    k−1 was reached. Returns one row per step:
    (step BIGINT, step_name, n_reached, rate = n_reached / n_entities,
    step_rate = n_reached / previous step's n_reached).

    Shape: the k sequential "first ts of step k strictly after step
    k−1" scalars are CHAINED WINDOW AGGREGATES over the one entity
    partition — s_k = min(ts where type=step_k ∧ ts > s_{k−1}) OVER
    (PARTITION BY entity) — so the whole funnel costs exactly ONE
    corpus Exchange on the entity key (the naive formulation, k
    aggregate+join-back rounds, re-derives the full lineage per round:
    measured 19 Exchanges for k=3 before this rewrite). The per-entity
    reduction that follows is already partitioned (no new Exchange),
    and the final step-count reduce is one row. No joins, no collect,
    no Python.
    """
    w = Window.partitionBy("_e")
    ent = df.select(
        F.col(entity_col).alias("_e"), F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
    )
    cols, prev = [], None
    for k, name in enumerate(steps):
        cond = F.col("_t") == name
        if prev is not None:
            cond = cond & (F.col("_ts") > F.col(prev))
        ent = ent.withColumn(f"_s{k}", F.min(F.when(cond, F.col("_ts"))).over(w))
        prev = f"_s{k}"
        cols.append(prev)
    # one row per entity (already partitioned by _e -> no new Exchange)
    reached = ent.groupBy("_e").agg(*[F.max(c).alias(c) for c in cols])
    counts = reached.agg(
        F.count(F.lit(1)).cast("long").alias("_n_ent"),
        *[
            F.count(F.col(f"_s{k}")).cast("long").alias(f"_n{k}")
            for k in range(len(steps))
        ],
    )
    # pivot the single counts row into per-step rows via inline(array
    # of structs) — a UNION of per-step selects would re-execute the
    # whole aggregate (and its corpus scan) once per branch: Spark has
    # no cross-branch common-subexpression elimination
    structs = []
    for k, name in enumerate(steps):
        prev = F.col("_n_ent") if k == 0 else F.col(f"_n{k-1}")
        structs.append(
            F.struct(
                F.lit(k).cast("long").alias("step"),
                F.lit(name).alias("step_name"),
                F.col(f"_n{k}").alias("n_reached"),
                (F.col(f"_n{k}").cast("double") / F.col("_n_ent").cast("double")).alias("rate"),
                F.when(
                    prev > 0, F.col(f"_n{k}").cast("double") / prev.cast("double")
                ).alias("step_rate"),
            )
        )
    return counts.select(F.inline(F.array(*structs)))


def cohort_retention(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int | None = None,
) -> DataFrame:
    """Classic cohort-retention grid: entities are cohorted by the DATE
    of their first event; for every (cohort_date, day_offset) cell,
    the count and fraction of that cohort active on cohort_date +
    offset. Returns (cohort_date, day_offset, n_active, n_cohort,
    retention), offset ≥ 0.

    Shape: one per-entity MIN aggregate (first date), joined back on
    the entity key (same-key join, no second corpus shuffle), a
    distinct over (cohort, offset, entity) — map-side combined, keys
    bounded by entities × active-days — then the tiny grid aggregate.
    """
    d = df.select(
        F.col(entity_col).alias("_e"), F.to_date(ts_col).alias("_d")
    )
    first = d.groupBy("_e").agg(F.min("_d").alias("_cohort"))
    joined = d.join(first, "_e").select(
        "_e", "_cohort", F.datediff("_d", F.col("_cohort")).alias("_off")
    )
    if max_offset_days is not None:
        joined = joined.where(F.col("_off") <= max_offset_days)
    active = joined.distinct()
    cohort_sizes = first.groupBy("_cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    grid = active.groupBy("_cohort", "_off").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    return (
        grid.join(cohort_sizes, "_cohort")
        .select(
            F.col("_cohort").alias("cohort_date"),
            F.col("_off").cast("long").alias("day_offset"),
            "n_active",
            "n_cohort",
            (F.col("n_active").cast("double") / F.col("n_cohort").cast("double")).alias("retention"),
        )
    )


def autocorrelation(
    df: DataFrame,
    entity_col: str,
    value_col: str,
    order_cols: Sequence[str],
    lag: int = 1,
    min_pairs: int = 3,
    decimal_scale: int = 6,
) -> DataFrame:
    """Per-entity lag-k autocorrelation of an ordered value series:
    Pearson r between x_t and x_{t−lag} over the entity's events —
    the "is this signal bursty or mean-reverting" feature for
    per-user/per-conversation telemetry.

    Same oracle-exact construction as fte/operators/selection.py's
    pairwise_corr: the (x, y=lagged x) pairs reduce to exact DECIMAL
    component sums per entity, the closed form runs once on
    bit-identical doubles. Entities with fewer than ``min_pairs``
    complete pairs or zero variance yield NULL acf. One entity-key
    Exchange (the lag window), then a same-key aggregate.
    """
    w = Window.partitionBy("_e").orderBy(*order_cols)
    x = F.col("_x")
    y = F.lag("_x", lag).over(w)
    pairs = (
        df.select(F.col(entity_col).alias("_e"), F.col(value_col).alias("_x"),
                  *[F.col(c) for c in order_cols])
        .select("_e", x.alias("_xv"), y.alias("_yv"))
        .where(F.col("_yv").isNotNull() & F.col("_xv").isNotNull())
    )
    dcast = f"decimal(38,{decimal_scale})"
    pcast = f"decimal(38,{decimal_scale * 2})"
    cx, cy = F.col("_xv").cast(dcast), F.col("_yv").cast(dcast)
    g = pairs.groupBy("_e").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(cx).cast("double").alias("_sx"),
        F.sum(cy).cast("double").alias("_sy"),
        F.sum((cx * cy).cast(pcast)).cast("double").alias("_sxy"),
        F.sum((cx * cx).cast(pcast)).cast("double").alias("_sxx"),
        F.sum((cy * cy).cast(pcast)).cast("double").alias("_syy"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("_sx"), F.col("_sy")
    var_term = (n * F.col("_sxx") - sx * sx) * (n * F.col("_syy") - sy * sy)
    return g.select(
        F.col("_e").alias(entity_col),
        "n_pairs",
        F.when(
            (F.col("n_pairs") >= min_pairs) & (var_term > 0),
            (n * F.col("_sxy") - sx * sy) / F.sqrt(var_term),
        ).alias("acf"),
    )
