from .parquet_source import load_all, table  # noqa: F401
from .csv_source import read_ohlcv_csv, discover_csv_files  # noqa: F401
from .sinks import write_csv  # noqa: F401
