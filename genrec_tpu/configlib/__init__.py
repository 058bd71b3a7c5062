from . import gin
from .cli import parse_config
from .gin import (REQUIRED, bind_parameter, clear_config, config_str,
                  configurable, constant, constants_from_enum,
                  external_configurable, operative_config, parse_config_file,
                  parse_config_files_and_bindings, query_parameter)

__all__ = [
    "gin", "parse_config", "REQUIRED", "bind_parameter", "clear_config",
    "config_str", "configurable", "constant", "constants_from_enum",
    "external_configurable", "operative_config", "parse_config_file",
    "parse_config_files_and_bindings", "query_parameter",
]
