"""Logic modules (runtime control): CLI command interface and dynamic EQ.

Mirrors the reference's dlopen'd .bflogic plugins (bfmod.h:282-320);
modules here receive the Engine (the bfaccess equivalent) directly.
"""

_REGISTRY = {}


def register_logic_module(name, factory):
    _REGISTRY[name] = factory


def load_logic_module(name, params, engine):
    if name not in _REGISTRY:
        if name == "cli":
            from . import cli  # noqa: F401
        elif name == "eq":
            from . import eq  # noqa: F401
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise RuntimeError(f"unknown logic module: {name}") from None
    return factory(params, engine)
