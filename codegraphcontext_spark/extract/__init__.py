from .html_extract import EXTRACTOR_VERSION, extract_text, extract_stage

__all__ = ["EXTRACTOR_VERSION", "extract_text", "extract_stage"]
