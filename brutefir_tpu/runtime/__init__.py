from .engine import Engine, EngineError
from .control import RuntimeControl
