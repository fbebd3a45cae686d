"""``mapInArrow``: the lowest-overhead Python boundary Spark offers.

Where ``mapInPandas`` converts each Arrow batch to a pandas DataFrame (an
object-array copy for strings), ``mapInArrow`` hands the RecordBatch to
Python as-is, so a vectorized kernel (pyarrow.compute, or anything
Arrow-native like polars/duckdb) runs with zero conversion cost. At 100 TB
this is the boundary to choose when per-row work is string/list-heavy and
the kernel exists in Arrow — the pandas hop would double memory for no
benefit. Kept as a parallel surface to the mapInPandas/UDTF chunkers so
the engine demonstrates all three Python boundaries with their tradeoffs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


def token_counts_arrow(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Whitespace token counts computed by a pure-Arrow kernel.

    Equivalent to ``F.size(F.split(text, '\\s+'))`` for non-empty trimmed
    text; the JVM expression is the hot-path choice — this exists to prove
    the Arrow-native boundary end-to-end (schema, batch iteration, column
    math without pandas)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            toks = pc.split_pattern_regex(b.column(text_col), r"\s+")
            yield pa.RecordBatch.from_arrays(
                [b.column(id_col), pc.list_value_length(toks).cast(pa.int64())],
                [id_col, "n_tokens"],
            )

    return df.select(id_col, text_col).mapInArrow(
        fn, f"{id_col} long, n_tokens long"
    )
