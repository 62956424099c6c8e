from .tpch import generate_lineitem, q1, q6  # noqa: F401
