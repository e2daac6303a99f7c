from .job_gold import run_gold  # noqa: F401
from .pipeline import run_pipeline  # noqa: F401
from .job_silver import run_silver  # noqa: F401
