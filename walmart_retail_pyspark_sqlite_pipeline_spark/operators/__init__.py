from .projections import enforce_schema, rename_columns

__all__ = ["rename_columns", "enforce_schema"]
