"""Table storage: transactional parquet MERGE target + change feed."""

from dozer_spark.storage.txtable import TransactionalTable

__all__ = ["TransactionalTable"]
