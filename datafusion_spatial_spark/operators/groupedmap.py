"""Grouped-map operators (``applyInPandas``) — the batch extension point for
per-group logic Spark built-ins can't express.

Each group's rows arrive as ONE pandas DataFrame, so groups must fit in
executor memory — the right tool for many-small-groups shapes (per-user,
per-entity model fits), not for whole-table transforms (use mapInPandas).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def fit_linear_per_group(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group least-squares line fit: (group, slope, intercept, n).
    Numerically centered (stable for large x like epochs)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].astype("float64")
        y = pdf[y_col].astype("float64")
        n = len(pdf)
        xm, ym = x.mean(), y.mean()
        den = ((x - xm) ** 2).sum()
        slope = float(((x - xm) * (y - ym)).sum() / den) if den > 0 else 0.0
        intercept = float(ym - slope * xm)
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "slope": [slope],
                "intercept": [intercept],
                "n": [n],
            }
        )

    gtype = dict(df.dtypes)[group_col]
    return df.groupBy(group_col).applyInPandas(
        fit, schema=f"{group_col} {gtype}, slope double, intercept double, n long"
    )


def normalize_per_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group z-score normalization (all original columns + out_col)."""

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=0)
        if sd > 0:
            pdf[out_col] = (v - v.mean()) / sd
        else:
            # constant group: 0.0 for real values, but a null input must
            # stay null (NaN -> NULL), not become a valid-looking zero
            pdf[out_col] = np.where(v.isna(), np.nan, 0.0)
        return pdf

    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes) + f", {out_col} double"
    return df.groupBy(group_col).applyInPandas(norm, schema=schema)
