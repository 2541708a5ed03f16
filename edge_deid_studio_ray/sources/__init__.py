from .pages import PAGES_SCHEMA, synthesize_pages_table, pages_dataset, ensure_pages_parquet

__all__ = ["PAGES_SCHEMA", "synthesize_pages_table", "pages_dataset", "ensure_pages_parquet"]
