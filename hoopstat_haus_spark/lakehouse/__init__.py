from hoopstat_haus_spark.lakehouse.table import TokenLakeTable  # noqa: F401
from hoopstat_haus_spark.lakehouse.compaction import CompactionPolicy  # noqa: F401
