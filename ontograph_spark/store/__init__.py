from ontograph_spark.store.base import QUAD_SCHEMA, QuadStoreBase
from ontograph_spark.store.memory import MemoryQuadStore
from ontograph_spark.store.parquet_store import ParquetQuadStore

__all__ = [
    "QUAD_SCHEMA",
    "QuadStoreBase",
    "MemoryQuadStore",
    "ParquetQuadStore",
]
