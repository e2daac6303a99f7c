"""Workload registry: every declared query/operator of the engine.

Each workload pairs a Spark-first implementation (DataFrame API; the
logical plan is declared and Catalyst/Tungsten pick the physical strategy)
with an ANSI-SQL oracle string that DuckDB can run on the same tables --
the driver's correctness gate (BASELINE.md).  Importing this package
registers all workloads.
"""

from .base import REGISTRY, Workload, load_tables, register  # noqa: F401
from . import relational  # noqa: F401,E402
from . import tpch_extra  # noqa: F401,E402
from . import sketches  # noqa: F401,E402
from . import layout  # noqa: F401,E402
from . import semistructured  # noqa: F401,E402
from . import timeseries  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import pipeline_ops  # noqa: F401,E402
from . import corpus_extra  # noqa: F401,E402
from . import etl_extra  # noqa: F401,E402
from . import sql_surface  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import lm_quality  # noqa: F401,E402
from . import curation_pipeline  # noqa: F401,E402
