from .oracle import OracleIndex  # noqa: F401
