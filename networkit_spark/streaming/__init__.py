from networkit_spark.streaming.dynamics import (
    EVENT_SCHEMA,
    DynConnectedComponents,
    DynKatzCentrality,
    apply_events,
    events_of,
    parse_dgs_lines,
    replay_at,
)

__all__ = [
    "EVENT_SCHEMA",
    "apply_events",
    "replay_at",
    "events_of",
    "parse_dgs_lines",
    "DynConnectedComponents",
    "DynKatzCentrality",
]
