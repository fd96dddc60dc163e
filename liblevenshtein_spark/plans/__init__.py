from .pipeline import LinkResult, run_linkage  # noqa: F401
