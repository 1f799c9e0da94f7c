"""Fused Pallas FFT-glue parity (ops/pallas_glue.py).

The pallas variants fuse the hermitian mirror+combine around the
half-size complex transforms into one VPU pass per direction (the
remaining glue attack from docs/ROADMAP.md item 2; the MXU-permutation
variant measured slower in situ). They must match the packed-path
transforms to float32 roundoff at every eligible shape, including the
packed bin-0 convention (DC real slot / Nyquist imaginary slot,
mirroring the reference's halfcomplex handling at
/root/reference/fftw_convfuns.h:503-561). Off-TPU the kernels run
interpreted (pallas_glue._interp).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from brutefir_tpu.ops import partconv as pc
from brutefir_tpu.ops import pallas_glue as pg

SHAPES = [(3, 256), (2, 1024), (1, 8192)]


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("C,M", SHAPES)
def test_rfft_planes_pallas_matches_packed(rng, C, M):
    x = _rand(rng, C, 2 * M)
    ref = np.asarray(pc.c2p(pc.rfft_packed(jnp.asarray(x))))
    got = np.asarray(pg.rfft_planes_pallas(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=2e-4 * np.abs(ref).max())


@pytest.mark.parametrize("C,M", SHAPES)
def test_irfft_planes_pallas_matches_packed(rng, C, M):
    p = jnp.asarray(_rand(rng, C, 2, M))
    ref = np.asarray(pc.irfft_packed(pc.p2c(p)))
    got = np.asarray(pg.irfft_planes_pallas(p))
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=2e-4 * np.abs(ref).max())


@pytest.mark.parametrize("C,M", SHAPES)
def test_irfft_planes_valid_pallas_is_lower_half(rng, C, M):
    p = jnp.asarray(_rand(rng, C, 2, M))
    full = np.asarray(pg.irfft_planes_pallas(p))
    got = np.asarray(pg.irfft_planes_valid_pallas(p))
    np.testing.assert_allclose(got, full[..., :M], rtol=0, atol=1e-6)


def test_roundtrip_identity(rng):
    x = _rand(rng, 4, 512)
    p = pg.rfft_planes_pallas(jnp.asarray(x))
    back = np.asarray(pg.irfft_planes_pallas(p))
    np.testing.assert_allclose(back, x, rtol=0, atol=1e-4)


def test_multidim_prefix(rng):
    """The kernels accept any channel prefix (crossfade passes [F, 2, N])."""
    p = jnp.asarray(_rand(rng, 2, 3, 2, 256))
    ref = np.asarray(pc.irfft_packed(pc.p2c(p)))
    got = np.asarray(pg.irfft_planes_pallas(p))
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=2e-4 * np.abs(ref).max())


def test_dispatch_gating(monkeypatch, rng):
    monkeypatch.setenv("BRUTEFIR_TPU_FFT_GLUE", "pallas")
    try:
        assert pc._pallas_glue_ok(256, jnp.float32)
        assert not pc._pallas_glue_ok(192, jnp.float32)  # not lane multiple
        assert not pc._pallas_glue_ok(128, jnp.float32)  # below 2*lanes
        assert not pc._pallas_glue_ok(256, jnp.float64)  # f32 only
        x = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
        a = np.asarray(pc.rfft_planes(x))
        b = np.asarray(pc.c2p(pc.rfft_packed(x)))
        np.testing.assert_allclose(a, b, rtol=0,
                                   atol=2e-4 * np.abs(b).max())
        p = jnp.asarray(rng.standard_normal((2, 2, 256)).astype(np.float32))
        av = np.asarray(pc.irfft_planes_valid(p))
        bv = np.asarray(pc.irfft_packed(pc.p2c(p)))[..., :256]
        np.testing.assert_allclose(av, bv, rtol=0,
                                   atol=2e-4 * np.abs(bv).max())
    finally:
        monkeypatch.delenv("BRUTEFIR_TPU_FFT_GLUE")
    assert not pc._pallas_glue_ok(256, jnp.float32)


def test_engine_e2e_with_pallas_glue(tmp_path, monkeypatch, rng):
    """A full engine run with BRUTEFIR_TPU_FFT_GLUE=pallas matches the
    default-glue run (float tolerance at the S32 output)."""
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine

    vals = np.clip((rng.standard_normal((256 * 4, 2)) * 2 ** 20).round(),
                   -(2 ** 23), 2 ** 23 - 1).astype("<i4")
    inp = tmp_path / "in.raw"
    vals.tofile(inp)
    outs = {}
    for glue in ("xla", "pallas"):
        monkeypatch.setenv("BRUTEFIR_TPU_FFT_GLUE", glue)
        outp = tmp_path / f"o_{glue}.raw"
        conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 256,2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0,1 {{ device: "file" {{ path: "{inp}"; }}; sample: "S32_LE"; channels: 2; }};
output 0,1 {{ device: "file" {{ path: "{outp}"; }}; sample: "S32_LE"; channels: 2; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")
        Engine(conf).run()
        outs[glue] = np.fromfile(outp, dtype="<i4")
    d = np.abs(outs["pallas"].astype(np.int64) - outs["xla"].astype(np.int64))
    assert d.max() <= 2


@pytest.mark.parametrize("shape,axis", [((2, 8, 128), -1),
                                        ((2, 8, 128), -2),
                                        ((4, 128), 0),
                                        ((64, 128), 1)])
def test_rev_axis_butterfly_is_exact_reversal(rng, shape, axis):
    # Mosaic's TC lowering has no lax.rev; _rev_axis composes it from
    # roll+select butterfly stages (one per index bit). pltpu.roll has
    # no eager evaluation rule, so the identity is checked inside an
    # interpret-mode kernel against jnp.flip for several ranks/axes.
    import jax
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = pg._rev_axis(x_ref[...], axis)

    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = np.asarray(pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=True)(x))
    np.testing.assert_array_equal(got, np.asarray(jnp.flip(x, axis)))


def test_glue_rejects_non_pow2_rows(monkeypatch, rng):
    """M=384 is lane-aligned but has 3 tile rows; the butterfly reversal
    only works on power-of-two axes, so glue_ok must refuse and the
    dispatcher must fall back to the (correct) XLA glue."""
    assert not pg.glue_ok(384, jnp.float32)
    monkeypatch.setenv("BRUTEFIR_TPU_FFT_GLUE", "pallas")
    x = jnp.asarray(rng.standard_normal((2, 768)).astype(np.float32))
    a = np.asarray(pc.rfft_planes(x))
    b = np.asarray(pc.c2p(pc.rfft_packed(x)))
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-4 * np.abs(b).max())
