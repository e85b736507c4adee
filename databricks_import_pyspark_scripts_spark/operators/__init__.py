from .cdc import DATA_TYPES, filter_data
from .partitioning import calculate_num_partitions, get_partition_count, size_output
from .void_scrub import drop_void_fields

__all__ = [
    "DATA_TYPES",
    "filter_data",
    "calculate_num_partitions",
    "get_partition_count",
    "size_output",
    "drop_void_fields",
]
