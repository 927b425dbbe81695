# Structured Streaming extensions (Autoloader-style incremental load).
from .load_stream import load_file_stream

__all__ = ["load_file_stream"]
