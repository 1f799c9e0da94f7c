"""Multi-device sharding: sharded step == single-device step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from brutefir_tpu.graph import build_graph_spec, CompiledGraph, make_ctrl
from brutefir_tpu.ops import partconv
from brutefir_tpu.ops.partconv import make_bank
from brutefir_tpu.parallel import make_mesh, ShardedGraph

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_equals_single(rng):
    N, B, C = 128, 4, 8
    taps = rng.standard_normal(N * B).astype(np.float32) * 0.1
    spec = build_graph_spec(N, B, C, C, [[] for _ in range(C)], [False] * C)
    bank = make_bank([partconv.preprocess_coeffs(taps, N, B)])
    ctrl = make_ctrl(
        spec, np.eye(C, dtype=np.float32), np.zeros((C, C), np.float32),
        np.eye(C, dtype=np.float32), np.zeros(C, np.int32),
        np.zeros(C, np.int32), np.ones((C, B), np.float32))
    xs = rng.standard_normal((6, C, N)).astype(np.float32)

    cg = CompiledGraph(spec)
    state = cg.init_state()
    ys_single = []
    for xb in xs:
        state, y = cg.step(state, ctrl, jnp.asarray(bank), jnp.asarray(xb))
        ys_single.append(np.asarray(y))

    mesh = make_mesh(jax.devices()[:8], f_axis=2)
    sg = ShardedGraph(cg, mesh)
    sstate = sg.init_state()
    sctrl, sbank, _ = sg.place(ctrl, jnp.asarray(bank), jnp.asarray(xs[0]))
    ys_shard = []
    for xb in xs:
        sstate, y = sg.step(sstate, sctrl, sbank, jnp.asarray(xb))
        ys_shard.append(np.asarray(y))

    for a, b in zip(ys_single, ys_shard):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-4)


def test_mesh_axes():
    mesh = make_mesh(jax.devices()[:8], f_axis=4)
    assert mesh.shape["f"] == 4 and mesh.shape["sp"] == 2
