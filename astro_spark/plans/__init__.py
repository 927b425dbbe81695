from .flatten import flatten_structs
from .identifiers import render_sql
from .skew import salted_join

__all__ = ["flatten_structs", "render_sql", "salted_join"]
