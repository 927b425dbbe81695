from .readers import read_file
from .writers import write_dataframe_to_file

__all__ = ["read_file", "write_dataframe_to_file"]
