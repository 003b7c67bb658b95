from .inspect import (  # noqa: F401
    executed_plan,
    formatted_plan,
    pushed_filters,
    read_schema,
)
