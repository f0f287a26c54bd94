"""Parity harness mimicking the driver's compare: row-count + schema +
order-insensitive value comparison, columns sorted by name.

Stricter than the driver in one way: we compare actual values (exact
for non-floats, exact-with-report for floats) so any drift shows up as
a readable diff instead of a hash mismatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for col in pdf.columns:
        s = pdf[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[col] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            pdf[col] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            pdf[col] = s.astype("float64")
        elif s.dtype == object:
            # decimals / lists: stringify deterministically
            pdf[col] = s.map(lambda v: repr(v) if isinstance(v, (list, np.ndarray)) else v)
    # stable order-insensitive row order
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort", na_position="last")
    return pdf.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col], o[col]
        if pd.api.types.is_float_dtype(sv):
            both_nan = sv.isna() & ov.isna()
            eq = (sv == ov) | both_nan
            if not eq.all():
                bad = (~eq).to_numpy().nonzero()[0][:5]
                detail = [(i, sv.iloc[i], ov.iloc[i], abs(sv.iloc[i] - ov.iloc[i])) for i in bad]
                raise AssertionError(
                    f"{name}: float col {col!r} differs at {int((~eq).sum())} rows "
                    f"(first few (idx, spark, oracle, absdiff): {detail})"
                )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                bad = (~eq).to_numpy().nonzero()[0][:5]
                detail = [(i, sv.iloc[i], ov.iloc[i]) for i in bad]
                raise AssertionError(
                    f"{name}: col {col!r} differs at {int((~eq).sum())} rows "
                    f"(first few (idx, spark, oracle): {detail})"
                )


def run_parity(spark, duck, spec, sf_dir: str) -> None:
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    # a 0-row match is vacuous — queries must produce rows at the
    # correctness scale factor to actually check anything
    assert len(spark_pdf) > 0, f"{spec.name}: empty result (vacuous parity)"
    assert_frames_match(spark_pdf, oracle_pdf, name=spec.name)
