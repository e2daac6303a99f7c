from .temporal import asof_join, sessionize  # noqa: F401
