from .config import Config, create_config, parse_task_dictionary, TASK_META

__all__ = ["Config", "create_config", "parse_task_dictionary", "TASK_META"]
