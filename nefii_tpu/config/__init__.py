from nefii_tpu.config.hocon import ConfigFactory, ConfigTree, parse_file, parse_string
from nefii_tpu.config.registry import get_class, register

__all__ = [
    "ConfigFactory",
    "ConfigTree",
    "parse_file",
    "parse_string",
    "get_class",
    "register",
]
