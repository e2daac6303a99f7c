from .files import read_ndjson, read_parquet_tables  # noqa: F401
from .rest import PaginatedRestSource  # noqa: F401
from .rest_datasource import PaginatedRestDataSource  # noqa: F401
