from .spec import GraphSpec, StageSpec, build_graph_spec
from .compile import CompiledGraph, StepState, StepCtrl, make_ctrl
