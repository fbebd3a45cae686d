"""Python UDTFs (Spark 4 table functions): row-expanding operators usable
from SQL via LATERAL joins.

UDTFs complement mapInPandas: they compose inside SQL (``FROM t, LATERAL
chunk_text(text, 200)``) and stream row-by-row, which suits variable-fanout
expansion. For fixed-schema batch kernels prefer mapInPandas (Arrow).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

CHUNK_SCHEMA = "chunk_idx int, chunk string, chunk_len int"


@udtf(returnType=CHUNK_SCHEMA)
class ChunkText:
    """Fixed-width document chunking — the standard preprocessing step that
    splits long documents into model-context-sized pieces. Deterministic:
    chunk i covers characters [i*width, (i+1)*width)."""

    def eval(self, text: str, width: int):
        if text is None or not width or width <= 0:
            return
        for i in range(0, (len(text) + width - 1) // width):
            piece = text[i * width : (i + 1) * width]
            yield i, piece, len(piece)


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("chunk_text", ChunkText)
