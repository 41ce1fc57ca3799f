"""Privacy-risk audit operators: k-anonymity, l-diversity, suppression,
generalization.

The reference is an anonymiser (mask strategies over configured columns,
`src/executor/query-builder.ts`); what it never answers is whether the
OUTPUT is safe to release. These operators close that loop with the two
classic release-audit measures (Sweeney 2002, "k-anonymity: a model for
protecting privacy"; Machanavajjhala et al. 2007, "l-diversity"):

- **k-anonymity**: every combination of quasi-identifier values (the
  columns an attacker can link on — zip, age band, segment) must be
  shared by ≥ k rows. :func:`k_anonymity` grades every equivalence
  class; :func:`k_anonymity_summary` collapses the audit to one row a
  release gate can assert on.
- **l-diversity**: a k-anonymous class is still unsafe when everyone in
  it shares the sensitive value (the homogeneity attack) —
  :func:`l_diversity` demands ≥ l DISTINCT sensitive values per class.
- **Enforcement**: :func:`suppress_to_k` drops rows of violating classes
  (suppression — the standard minimum-distortion fix), and
  :func:`generalize_num` coarsens a numeric column to fixed-width bands
  (generalization — trades precision for bigger classes; re-audit after).

Scale shape: each audit is ONE partial-aggregated groupBy over the quasi
columns (map-side combine; the class table is |classes|-sized, not
|rows|-sized). Enforcement joins the class verdicts back on the quasi
columns — null-safe (NULL quasi values form their own class, exactly SQL
GROUP BY semantics), shuffle-on-quasi with AQE free to broadcast the
class side when it is small. No windows, no collects, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quasi(quasi_cols) -> list[str]:
    cols = list(quasi_cols)
    if not cols:
        raise ValueError("quasi_cols must name at least one column")
    return cols


def k_anonymity(df: DataFrame, quasi_cols, k: int) -> DataFrame:
    """Per-equivalence-class audit: one row per distinct quasi-identifier
    combination with its size and whether it violates k. NULL quasi
    values form their own class (GROUP BY semantics — an attacker can
    link on "field is missing" too)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cols = _quasi(quasi_cols)
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("class_n"))
        .withColumn("violates", F.col("class_n") < k)
    )


def k_anonymity_summary(df: DataFrame, quasi_cols, k: int) -> dict:
    """The release-gate verdict, one driver-sized dict: class counts,
    rows at risk, and the dataset's ACTUAL k (its smallest class)."""
    classes = k_anonymity(df, quasi_cols, k)
    row = classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("violates"), 1).otherwise(0)).alias(
            "n_violating_classes"
        ),
        F.sum(F.when(F.col("violates"), F.col("class_n")).otherwise(0)).alias(
            "rows_at_risk"
        ),
        F.min("class_n").alias("k_actual"),
        F.sum("class_n").alias("n_rows"),
    ).first()
    d = {name: (int(row[name]) if row[name] is not None else 0)
         for name in row.asDict()}
    d["k_required"] = k
    d["satisfied"] = d["n_violating_classes"] == 0
    return d


def l_diversity(
    df: DataFrame, quasi_cols, sensitive_col: str, l_required: int
) -> DataFrame:
    """Per-class distinct-sensitive-value audit (distinct l-diversity):
    a class where everyone shares the sensitive value leaks it even at
    high k. NULL sensitive values do not count toward diversity
    (count(DISTINCT) SQL semantics — "unknown" is not a disclosure)."""
    if l_required < 1:
        raise ValueError("l_required must be >= 1")
    cols = _quasi(quasi_cols)
    if sensitive_col in cols:
        raise ValueError("sensitive_col cannot also be a quasi-identifier")
    return (
        df.groupBy(*cols)
        .agg(
            F.count(F.lit(1)).alias("class_n"),
            F.countDistinct(sensitive_col).alias("distinct_sensitive"),
        )
        .withColumn("violates", F.col("distinct_sensitive") < l_required)
    )


def suppress_to_k(df: DataFrame, quasi_cols, k: int) -> DataFrame:
    """ENFORCE k-anonymity by suppression: drop every row whose
    equivalence class is smaller than k. The surviving frame is
    k-anonymous on ``quasi_cols`` by construction (re-auditable with
    :func:`k_anonymity`). Null-safe join: NULL-quasi rows suppress or
    survive as one class, never leak through the join."""
    cols = _quasi(quasi_cols)
    keep = (
        k_anonymity(df, cols, k)
        .where(~F.col("violates"))
        .select(*cols)
    )
    cond = None
    for c in cols:
        eq = df[c].eqNullSafe(keep[c])
        cond = eq if cond is None else cond & eq
    return df.join(keep, cond, "left_semi")


def generalize_num(col, width: float):
    """Fixed-width numeric generalization: the band's lower bound
    (floor(x / width) · width) — the classic coarsening that ENLARGES
    equivalence classes so suppression destroys fewer rows. A column
    expression (pure map-side); NULL stays NULL."""
    if width <= 0:
        raise ValueError("width must be positive")
    c = col if not isinstance(col, str) else F.col(col)
    return F.floor(c / F.lit(width)) * F.lit(width)
