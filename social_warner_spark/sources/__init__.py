from social_warner_spark.sources.rest import read_paged, PagedRestDataSource

__all__ = ["read_paged", "PagedRestDataSource"]
