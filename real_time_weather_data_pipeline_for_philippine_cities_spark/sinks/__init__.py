from .tables import (
    LOCATIONS_DDL_COLUMNS,
    OBSERVATIONS_DDL_COLUMNS,
    append_observations,
    ensure_tables,
    overwrite_locations_dim,
    write_snapshot,
)

__all__ = [
    "LOCATIONS_DDL_COLUMNS",
    "OBSERVATIONS_DDL_COLUMNS",
    "append_observations",
    "ensure_tables",
    "overwrite_locations_dim",
    "write_snapshot",
]
