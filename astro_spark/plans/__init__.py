from .flatten import flatten_structs
from .identifiers import render_sql

__all__ = ["flatten_structs", "render_sql"]
