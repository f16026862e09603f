"""Sources & sinks (SURVEY.md §2.1) and write/refresh modes (§2.2).

The reference's I/O surface: internal table scans, Spectrum external
scans over partitioned S3, COPY/UNLOAD bulk moves, JSON-lines
compaction, JDBC pulls, REST extracts. In Spark, scans and bulk
moves collapse into ``spark.read``/``df.write``; what remains worth
engineering is the catalog (name -> location) and the four refresh
patterns every model ends with.
"""

from .binaryfile import media_catalog, read_binary_files
from .catalog import Catalog
from .writers import (full_refresh, upsert, snapshot, append, compact,
                      backup_table, restore_missing_snapshots,
                      read_snapshot_as_of)
from .jsonl import compact_json_hour_partition, compact_json_with_quarantine
from . import txlog

__all__ = [
    "Catalog",
    "txlog",
    "full_refresh",
    "upsert",
    "snapshot",
    "read_snapshot_as_of",
    "append",
    "compact",
    "compact_json_hour_partition",
    "compact_json_with_quarantine",
    "media_catalog",
    "read_binary_files",
]
