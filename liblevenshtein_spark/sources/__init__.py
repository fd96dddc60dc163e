from .tables import load_testdata, read_table, write_table  # noqa: F401
