# Structured Streaming extensions (Autoloader-style incremental load,
# watermarked windows, stateful sessionization).
from .load_stream import load_file_stream
from .sessions import sessionize_stream
from .windows import windowed_counts_stream

__all__ = ["load_file_stream", "sessionize_stream", "windowed_counts_stream"]
