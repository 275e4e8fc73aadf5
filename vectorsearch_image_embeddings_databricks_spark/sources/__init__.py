from .binary import clean_path, ingest_binary_dir, save_as_table  # noqa: F401
from .catalog import ensure_database, volume_dir  # noqa: F401
from .formats import read_table, write_table  # noqa: F401
