from .mesh import make_mesh, step_shardings, ShardedGraph
