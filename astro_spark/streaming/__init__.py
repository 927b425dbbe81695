# Structured Streaming extensions (Autoloader-style incremental load,
# watermarked windows, stateful sessionization, streaming dedup).
from .joins import interval_join_stream, stream_static_join
from .load_stream import (
    aggregate_mv_stream,
    compact_mv_partials,
    fan_out_stream,
    ivf_index_stream,
    load_file_stream,
    load_file_stream_changes,
    load_file_stream_merge,
    load_file_stream_versioned,
    load_file_stream_scd2,
)
from .sessions import (
    bloom_screen_stream,
    build_semantic_index,
    semantic_screen_stream,
    containment_screen_stream,
    signature_screen_stream,
    dedup_stream,
    kmv_stream,
    minhash_screen_stream,
    sessionize_stream,
    weighted_sample_stream,
)
from .windows import (
    drift_screen_stream,
    late_data_windowed_counts,
    windowed_counts_stream,
)

__all__ = [
    "aggregate_mv_stream",
    "signature_screen_stream",
    "build_semantic_index",
    "semantic_screen_stream",
    "compact_mv_partials",
    "bloom_screen_stream",
    "containment_screen_stream",
    "drift_screen_stream",
    "dedup_stream",
    "minhash_screen_stream",
    "interval_join_stream",
    "ivf_index_stream",
    "kmv_stream",
    "stream_static_join",
    "load_file_stream",
    "load_file_stream_changes",
    "load_file_stream_merge",
    "load_file_stream_versioned",
    "load_file_stream_scd2",
    "sessionize_stream",
    "fan_out_stream",
    "late_data_windowed_counts",
    "weighted_sample_stream",
    "windowed_counts_stream",
]
