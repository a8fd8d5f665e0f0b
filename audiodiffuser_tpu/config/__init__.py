from .core import Config, compose, expand_multirun, instantiate

__all__ = ["Config", "compose", "expand_multirun", "instantiate"]
