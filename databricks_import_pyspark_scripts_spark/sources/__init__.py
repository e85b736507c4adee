from .registry import TABLES, load_table, read_source, register_views
from .versioned import (
    ChangelogNotFoundError,
    fetch_data,
    parse_table_versions_map,
    read_changes,
    read_snapshot,
    read_snapshot_at_timestamp,
)

__all__ = [
    "TABLES",
    "load_table",
    "read_source",
    "register_views",
    "ChangelogNotFoundError",
    "fetch_data",
    "parse_table_versions_map",
    "read_changes",
    "read_snapshot",
    "read_snapshot_at_timestamp",
]
