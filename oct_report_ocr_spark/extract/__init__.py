from .core import ExtractResult, extract_one

__all__ = ["ExtractResult", "extract_one"]
