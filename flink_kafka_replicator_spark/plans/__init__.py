"""Physical-plan inspection helpers."""

from .explain import (  # noqa: F401
    codegen_stage_count,
    exchange_count,
    executed_plan,
    formatted_plan,
    plan_contains,
    pushed_filters,
)
from .lint import (  # noqa: F401
    lint_plan,
    lint_plan_text,
    single_partition_consumers,
)
