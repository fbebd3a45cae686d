from .parquet import write_parquet
from .sqlite import write_sqlite

__all__ = ["write_sqlite", "write_parquet"]
