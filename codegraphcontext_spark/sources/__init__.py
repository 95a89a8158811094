from .pages_source import (
    PAGES_SCHEMA,
    infer_format,
    read_pages,
    write_pages_csv,
    write_pages_jsonl,
    write_pages_warc,
)

__all__ = [
    "PAGES_SCHEMA",
    "infer_format",
    "read_pages",
    "write_pages_csv",
    "write_pages_jsonl",
    "write_pages_warc",
]
