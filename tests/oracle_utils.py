"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row count, schema (column names), and order-insensitive value equality
with columns sorted by name."""

from __future__ import annotations

import math
from decimal import Decimal

import pandas as pd


def _canon_cell(v):
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(round(v, 9)))
    if v is None:
        return ("none", "")
    # sequences canonicalize element-wise so a Spark list and a DuckDB
    # numpy array of the same values compare equal (cell type depends
    # on whether Arrow is enabled, not on the query's result)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("seq", tuple(_canon_cell(x) for x in v))
    return (type(v).__name__, str(v))


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def _dump_mismatch(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    """Persist both frames on mismatch so a rare / non-reproducible
    failure (e.g. the round-7 streaming_flight_dist one-time flake)
    leaves a post-mortem artifact instead of only a 5-row diff."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix=f"oracle_mismatch_{name or 'q'}_")
    spark_pdf.to_csv(os.path.join(d, "spark.csv"), index=False)
    duck_pdf.to_csv(os.path.join(d, "duck.csv"), index=False)
    try:
        # streaming queries: include the recent run_to_memory progress
        # records (batches / input rows / state rows / checkpoint dirs)
        # so a one-off streaming mismatch pinpoints the stage that lost
        # rows (round-7's streaming_flight_dist flake left no such trail)
        import json

        from storm_bench_spark.streaming.streams import last_stream_diagnostics

        diag = last_stream_diagnostics()
        if diag:
            with open(os.path.join(d, "stream_diag.json"), "w") as f:
                json.dump(diag, f, indent=1)
    except Exception:  # noqa: BLE001 — best-effort breadcrumb
        pass
    return d


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    if len(spark_pdf) != len(duck_pdf):
        d = _dump_mismatch(name, spark_pdf, duck_pdf)
        raise AssertionError(
            f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}; frames dumped to {d}"
        )
    sp = canonical_rows(spark_pdf)
    du = canonical_rows(duck_pdf)
    if sp != du:
        diffs = [(a, b) for a, b in zip(sp, du) if a != b][:5]
        d = _dump_mismatch(name, spark_pdf, duck_pdf)
        raise AssertionError(
            f"{name}: value mismatch; first diffs {diffs}; frames dumped to {d}"
        )
