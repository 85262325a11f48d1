from .mbtiles import write_mbtiles
from .partitioned import write_partitioned_parquet

__all__ = ["write_mbtiles", "write_partitioned_parquet"]
