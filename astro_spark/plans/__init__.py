from .flatten import flatten_structs
from .identifiers import render_sql
from .asof import asof_join
from .range_join import range_join
from .skew import salted_join

__all__ = ["asof_join", "flatten_structs", "range_join", "render_sql", "salted_join"]
