from .bucketed import read_table, write_bucketed
from .quarantine import read_csv_quarantine
from .testdata import TESTDATA_TABLES, load_table, register_views

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "register_views",
    "read_csv_quarantine",
    "read_table",
    "write_bucketed",
]
