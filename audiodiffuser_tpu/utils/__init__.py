from .utils import (
    extras,
    get_metric_value,
    print_config_tree,
    seed_everything,
    should_print_config,
    task_wrapper,
)

__all__ = [
    "extras",
    "get_metric_value",
    "print_config_tree",
    "seed_everything",
    "should_print_config",
    "task_wrapper",
]
