from .tables import TESTDATA_TABLES, load_tables

__all__ = ["TESTDATA_TABLES", "load_tables"]
