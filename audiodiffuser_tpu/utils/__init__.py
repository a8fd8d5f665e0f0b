from .utils import get_metric_value, print_config_tree, seed_everything, task_wrapper

__all__ = ["get_metric_value", "print_config_tree", "seed_everything", "task_wrapper"]
