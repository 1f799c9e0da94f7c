from .lexer import tokenize, Token, T, ConfigParseError
from .model import BFConfig, CoeffDef, IODevDef, FilterDef, IN, OUT
from .parser import parse_config, parse_config_file, from_db
from .defaults import DEFAULT_CONFIG_TEXT, ensure_defaults_file
