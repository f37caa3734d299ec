from .registry import all_oracles, all_queries, query, run, summary  # noqa: F401
