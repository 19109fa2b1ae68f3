"""Grouped-map (applyInPandas) operators — the Python escape hatch for
per-group logic that genuinely needs the whole group in one frame.

Everything here is ALSO expressible with window functions; these exist to
keep the grouped-map Arrow path exercised and contract-tested (the oracle
for ``grouped_zscore`` is the window-function formulation). At 100 TB the
constraint is group size, not row count: one group must fit one executor's
pandas frame — key choice is the scale knob.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def grouped_zscore(df: DataFrame, group_col: str, id_col: str, value_col: str) -> DataFrame:
    """Per-group z-score normalization: (x - mean) / stddev_samp."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        m = pdf[value_col].mean()
        s = pdf[value_col].std(ddof=1)  # sample stddev == SQL stddev_samp
        z = (pdf[value_col] - m) / s if s and s == s else pdf[value_col] * 0.0
        out = pdf[[group_col]].copy()
        out[id_col] = pdf[id_col]
        out["zscore"] = z.round(6)
        return out

    return df.groupBy(group_col).applyInPandas(
        normalize, f"{group_col} string, {id_col} bigint, zscore double"
    )
