"""Feature-selection statistics: Pearson correlation and mutual
information, computed so a SQL oracle can reproduce every output bit.

Why not ``F.corr``: both Spark's and DuckDB's built-in corr accumulate
doubles in scan order, which differs between engines in the last ulp —
the repo's value-hashing oracle gate would flap. Instead both operators
reduce to EXACT integer / decimal component sums (order-independent)
and apply the closed-form formula once, on bit-identical operands.

Scale shape: correlation is ONE map-side-combined aggregate producing a
single row of component sums per feature pair — no shuffle beyond the
1-row reduce, no second pass, no collect. MI is one tiny (bins×labels)
hash aggregate after a broadcast of the bin boundaries. Both survive
any corpus size; the driver never sees more than O(#features²) values.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def pairwise_corr(
    df: DataFrame, cols: Sequence[str], decimal_scale: int = 6
) -> DataFrame:
    """Pearson r for every unordered pair of ``cols``, one output row
    per pair: (x_name, y_name, n, r).

    r = (n·Σxy − Σx·Σy) / sqrt((n·Σxx − Σx²) · (n·Σyy − Σy²)),
    with every Σ accumulated in DECIMAL(38, scale·2 for products) so
    the sums are exact and order-independent; the formula then runs on
    doubles derived from identical operands → identical on every
    engine. NULLs in either column drop that row from that pair's
    sums (pairwise-complete, like pandas ``DataFrame.corr``).

    Overflow policy: under Spark 4's default ANSI mode a value whose
    square exceeds the DECIMAL(38) range THROWS (loud) rather than
    silently skewing r — the same deliberate choice as
    ``standardize``'s documented failure mode; pick ``decimal_scale``
    so |x|² fits 38−2·scale integer digits for the data at hand.

    One aggregate computes ALL pairs' components (Catalyst shares the
    scan), then a literal-backed union pivots the single row into
    pair rows — no per-pair pass.
    """
    pairs = [(cols[i], cols[j]) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    dcast = f"decimal(38,{decimal_scale})"
    pcast = f"decimal(38,{decimal_scale * 2})"
    aggs = []
    for x, y in pairs:
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        cx = F.when(both, F.col(x).cast(dcast))
        cy = F.when(both, F.col(y).cast(dcast))
        tag = f"{x}__{y}"
        aggs += [
            F.count(F.when(both, F.lit(1))).cast("long").alias(f"_n_{tag}"),
            F.sum(cx).cast("double").alias(f"_sx_{tag}"),
            F.sum(cy).cast("double").alias(f"_sy_{tag}"),
            F.sum((cx * cy).cast(pcast)).cast("double").alias(f"_sxy_{tag}"),
            F.sum((cx * cx).cast(pcast)).cast("double").alias(f"_sxx_{tag}"),
            F.sum((cy * cy).cast(pcast)).cast("double").alias(f"_syy_{tag}"),
        ]
    one = df.agg(*aggs)
    # inline(array<struct>) pivots the single component-sum row into
    # pair rows in ONE plan — a union of per-pair selects would
    # re-execute the aggregate (and its corpus scan) per branch
    structs = []
    for x, y in pairs:
        tag = f"{x}__{y}"
        n = F.col(f"_n_{tag}").cast("double")
        sx, sy = F.col(f"_sx_{tag}"), F.col(f"_sy_{tag}")
        sxy, sxx, syy = F.col(f"_sxy_{tag}"), F.col(f"_sxx_{tag}"), F.col(f"_syy_{tag}")
        var_term = (n * sxx - sx * sx) * (n * syy - sy * sy)
        structs.append(
            F.struct(
                F.lit(x).alias("x_name"),
                F.lit(y).alias("y_name"),
                F.col(f"_n_{tag}").alias("n"),
                F.when(var_term > 0, (n * sxy - sx * sy) / F.sqrt(var_term)).alias("r"),
            )
        )
    return one.select(F.inline(F.array(*structs)))


def mutual_info_cells(
    df: DataFrame,
    bin_col,
    label_col,
) -> DataFrame:
    """Mutual information between a discrete feature and a discrete
    label, emitted as PER-CELL rows rather than one scalar:
    (bin, y, n_xy, n_x, n_y, n, mi_term) with
    mi_term = (n_xy/n) · ln( (n_xy·n) / (n_x·n_y) ), so
    MI = Σ mi_term. Per-cell output sidesteps the one remaining
    cross-engine hazard — the ORDER of the final Σ over cells — and
    gives the analyst the decomposition anyway (which cells carry the
    dependence). All operands inside each term are exact BIGINTs.

    ``bin_col`` / ``label_col`` are Columns or names (pre-binned —
    compose with quantile_bin for continuous features). One hash
    aggregate over (bin, y), then window totals over the tiny cell
    frame. NULL bins/labels participate as their own category (they
    are informative at curation time).
    """
    from pyspark.sql import Window

    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    cells = df.groupBy(b.alias("bin"), y.alias("y")).agg(
        F.count(F.lit(1)).cast("long").alias("n_xy")
    )
    w_b = Window.partitionBy("bin")
    w_y = Window.partitionBy("y")
    w_all = Window.partitionBy()
    enriched = cells.select(
        "bin",
        "y",
        "n_xy",
        F.sum("n_xy").over(w_b).cast("long").alias("n_x"),
        F.sum("n_xy").over(w_y).cast("long").alias("n_y"),
        F.sum("n_xy").over(w_all).cast("long").alias("n"),
    )
    n_xy = F.col("n_xy").cast("double")
    term = (n_xy / F.col("n").cast("double")) * F.log(
        (n_xy * F.col("n").cast("double"))
        / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
    )
    return enriched.withColumn("mi_term", term)


def chi2_cells(
    df: DataFrame,
    bin_col,
    label_col,
) -> DataFrame:
    """Chi-squared test-of-independence cells for a discrete feature ×
    discrete label — the significance companion to
    ``mutual_info_cells`` (MI measures strength; χ² calibrates it
    against sample size). Emits per-cell rows (bin, y, n_xy, n_x, n_y,
    n, expected, chi2_term) with expected = n_x·n_y/n and
    chi2_term = (n_xy − expected)² / expected, so χ² = Σ chi2_term
    with dof = (|bins|−1)(|labels|−1). Per-cell emission keeps every
    hashed value derived from exact BIGINTs in a fixed expression —
    the same cross-engine discipline as the MI operator, and the same
    single (bin, y) hash-aggregate cost."""
    from pyspark.sql import Window

    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    observed = df.groupBy(b.alias("bin"), y.alias("y")).agg(
        F.count(F.lit(1)).cast("long").alias("n_xy")
    )
    # χ² is defined over the FULL bins × labels grid: a structurally
    # empty cell still contributes (0 − expected)²/expected, so the
    # observed-cells-only frame would understate the statistic
    # (pytest: perfect 2×2 dependence reads 100 instead of n=200).
    # The grid is |bins|·|labels| rows — tiny by construction.
    grid = observed.select("bin").distinct().crossJoin(
        observed.select("y").distinct()
    )
    obs = observed.select(
        F.col("bin").alias("_ob"), F.col("y").alias("_oy"), "n_xy"
    )
    # null-safe match: a NULL bin/label is its own category here too
    cells = grid.join(
        obs,
        F.col("bin").eqNullSafe(F.col("_ob")) & F.col("y").eqNullSafe(F.col("_oy")),
        "left",
    ).select(
        "bin", "y", F.coalesce("n_xy", F.lit(0)).cast("long").alias("n_xy")
    )
    w_b = Window.partitionBy("bin")
    w_y = Window.partitionBy("y")
    w_all = Window.partitionBy()
    e = cells.select(
        "bin",
        "y",
        "n_xy",
        F.sum("n_xy").over(w_b).cast("long").alias("n_x"),
        F.sum("n_xy").over(w_y).cast("long").alias("n_y"),
        F.sum("n_xy").over(w_all).cast("long").alias("n"),
    )
    expected = (
        F.col("n_x").cast("double") * F.col("n_y").cast("double")
    ) / F.col("n").cast("double")
    diff = F.col("n_xy").cast("double") - expected
    return e.select(
        "bin", "y", "n_xy", "n_x", "n_y", "n",
        expected.alias("expected"),
        (diff * diff / expected).alias("chi2_term"),
    )
