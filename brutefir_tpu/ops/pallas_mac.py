"""Fused Pallas TPU kernel for the partitioned spectral MAC.

This is the engine's hot loop -- the counterpart of the reference's
hand-vectorized SSE complex-MAC kernels (`convolver_xmm.c:11-62`, dispatched
from fftw_convolver.c:253-328). The dense jnp path materializes two
[F, B, 2, N] temporaries per block (the rotated ring gather and the
coefficient-bank gather); at 26 filters x 16 partitions x 8k bins that is
~80 MB of HBM traffic per block. This kernel fuses all of it:

* the bin axis is reshaped N -> (N/128, 128) so every block is a fully
  populated (sublane, lane) tile -- no relayout padding;
* grid = (filters,): each step DMAs one filter's whole [B, 2, N] ring row
  and its coefficient row -- fetched straight from the *bank* at the
  prefetched coefficient index, so the per-filter gather never exists;
* the partition loop runs inside the kernel with the ring rotation
  (t - b) mod B as a prefetched index vector resolved by dynamic VMEM
  indexing, accumulating in registers/VMEM;
* the partition-validity mask (the reference's cblocks clamp) multiplies
  each partition's contribution.

Bin 0 packs DC and Nyquist as independent real products (see partconv);
the kernel computes it as a normal complex lane and the caller patches the
single bin afterwards with a tiny [F, B] contraction.

Measured on TPU v5e ("TPU v5 lite") at the flagship shape (26 filters x
16 partitions x 8192 bins, identical checksums both paths). Timing
methodology matters on this hardware path: the remote-device relay acks
``block_until_ready`` before execution completes, so naive dispatch-loop
timings under-report by 10-40x (a 0.54 GB/iter elementwise chain
"measured" 107 TB/s that way). These numbers run the iteration loop
on-device under ``lax.scan`` with a data dependence between iterations
and force completion with a scalar fetch; per-iteration time is the
slope between K=16 and K=144 scan lengths, median of 5:

| shape (B=16, N=8192, distinct coeffs) | dense (spectral_mac_rollh) | this kernel (row variant) |
|---|---|---|
| F=26 (flagship)  | **0.16 ms** | 0.63 ms |
| F=64             | 1.00 ms | **0.69 ms** |
| F=128            | 2.77 ms | **1.41 ms** |
| F=256            | 6.49 ms | **2.82 ms** |

The dense path fuses its one remaining gather into the reduction at
small filter counts and runs at HBM speed-of-light (~700 GB/s effective
at F=26); at larger F/E the gather materializes and it degrades, while
this kernel keeps reading ring+bank exactly once -- linear in F
(~11 us/filter) past a ~0.35 ms fixed cost. The engine picks the kernel
automatically for TPU configs with >=48 filters selecting mostly
distinct coefficient sets (`runtime/engine.py`); `BRUTEFIR_TPU_MAC`
overrides, ``BRUTEFIR_TPU_PALLAS_VARIANT`` picks "row" (whole ring+bank
rows resident in VMEM, partition loop in-kernel) vs "tile" (grid (F, B),
one partition per step -- the fallback when rows exceed the VMEM
budget). Both variants are tested against the dense path (same terms;
summation order differs to float tolerance).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mac_kernel(idx_ref, rpos_ref, mask_ref, ring_ref, bank_ref, out_ref):
    # scalar-prefetch: idx [F], rpos [B], mask [F, B] (SMEM)
    # blocks: ring/bank (1, 1, 2, R, 128) at the rotated / gathered rows;
    # out (1, 2, R, 128), accumulated across the innermost partition axis
    f = pl.program_id(0)
    b = pl.program_id(1)
    m = mask_ref[f, b]
    rr = ring_ref[0, 0, 0]
    ri = ring_ref[0, 0, 1]
    hr = bank_ref[0, 0, 0] * m
    hi = bank_ref[0, 0, 1] * m

    @pl.when(b == 0)
    def _():
        out_ref[0, 0] = rr * hr - ri * hi
        out_ref[0, 1] = rr * hi + ri * hr

    @pl.when(b > 0)
    def _():
        out_ref[0, 0] += rr * hr - ri * hi
        out_ref[0, 1] += rr * hi + ri * hr


def _mac_kernel_rowmajor(idx_ref, rpos_ref, mask_ref, ring_ref, bank_ref,
                         out_ref):
    # grid (F,): one step holds a filter's whole ring row [B, 2, R, 128]
    # and its gathered bank row in VMEM; the partition loop runs in-kernel
    # with the rotation resolved by dynamic VMEM indexing. One DMA pass
    # over ring+bank total; the accumulator lives in VMEM (out_ref).
    f = pl.program_id(0)
    B = ring_ref.shape[1]
    out_ref[0, 0] = jnp.zeros_like(out_ref[0, 0])
    out_ref[0, 1] = jnp.zeros_like(out_ref[0, 1])

    def body(b, _):
        m = mask_ref[f, b]
        rb = rpos_ref[b]
        rr = ring_ref[0, rb, 0]
        ri = ring_ref[0, rb, 1]
        hr = bank_ref[0, b, 0] * m
        hi = bank_ref[0, b, 1] * m
        out_ref[0, 0] += rr * hr - ri * hi
        out_ref[0, 1] += rr * hi + ri * hr
        return 0

    jax.lax.fori_loop(0, B, body, 0)


def _rowmajor_call(ring5, bank5, coeff_idx, rpos, maskf, interpret):
    F, B, _, R, _ = ring5.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, B, 2, R, 128),
                         lambda f, idx, rp, mk: (f, 0, 0, 0, 0)),
            pl.BlockSpec((1, B, 2, R, 128),
                         lambda f, idx, rp, mk: (idx[f], 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, R, 128),
                               lambda f, idx, rp, mk: (f, 0, 0, 0)),
    )
    return pl.pallas_call(
        _mac_kernel_rowmajor,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, 2, R, 128), ring5.dtype),
        interpret=interpret,
    )(coeff_idx, rpos, maskf, ring5, bank5)


def _mac_core(ring: jax.Array, bank: jax.Array, coeff_idx: jax.Array,
              mask: jax.Array, rpos: jax.Array,
              interpret: bool = False) -> jax.Array:
    """The kernel proper: all bins as normal complex lanes (no bin-0 patch)."""
    F, B, _, N = ring.shape
    E = bank.shape[0]
    R = N // 128
    ring5 = ring.reshape(F, B, 2, R, 128)
    bank5 = bank.reshape(E, B, 2, R, 128)
    maskf = mask.astype(ring.dtype)

    # Variant: "row" keeps a filter's whole [B, 2, N] ring+bank rows in
    # VMEM and loops partitions in-kernel (one DMA pass total); "tile"
    # (grid (F, B)) streams one partition per step and is the fallback
    # when the rows exceed the VMEM budget (double-buffered).
    import os
    variant = os.environ.get("BRUTEFIR_TPU_PALLAS_VARIANT", "auto")
    row_bytes = B * 2 * N * 4
    if variant == "auto":
        variant = "row" if 4 * row_bytes <= 12 * 2**20 else "tile"
    if variant == "row":
        y5 = _rowmajor_call(ring5, bank5, coeff_idx.astype(jnp.int32),
                            rpos, maskf, interpret)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F, B),
            in_specs=[
                pl.BlockSpec((1, 1, 2, R, 128),
                             lambda f, b, idx, rp, mk: (f, rp[b], 0, 0, 0)),
                pl.BlockSpec((1, 1, 2, R, 128),
                             lambda f, b, idx, rp, mk: (idx[f], b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 2, R, 128),
                                   lambda f, b, idx, rp, mk: (f, 0, 0, 0)),
        )
        y5 = pl.pallas_call(
            _mac_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((F, 2, R, 128), ring.dtype),
            interpret=interpret,
        )(coeff_idx.astype(jnp.int32), rpos, maskf, ring5, bank5)
    return y5.reshape(F, 2, N)


def _bin0(ring, bank, coeff_idx, mask, rpos):
    """Bin 0 packs DC and Nyquist: real/imag planes multiply independently."""
    rot0 = jnp.take(ring[:, :, :, 0], rpos, axis=1)          # [F, B, 2]
    h0 = jnp.take(bank[:, :, :, 0], coeff_idx, axis=0) * mask[:, :, None]
    y0r = jnp.sum(rot0[:, :, 0] * h0[:, :, 0], axis=1)
    y0i = jnp.sum(rot0[:, :, 1] * h0[:, :, 1], axis=1)
    return y0r, y0i


def pallas_spectral_mac(ring: jax.Array, bank: jax.Array, coeff_idx: jax.Array,
                        mask: jax.Array, t: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """Y[f] = sum_b ring[f, (t-b)%B] (*) (bank[coeff_idx[f], b] * mask[f, b]).

    ring: [F, B, 2, N] f32   bank: [E, B, 2, N] f32
    coeff_idx: [F] i32       mask: [F, B] f32     t: scalar i32
    Returns [F, 2, N] f32 (packed spectra, bin 0 fixed up here).
    """
    B = ring.shape[1]
    rpos = jnp.mod(t - jnp.arange(B, dtype=jnp.int32), B).astype(jnp.int32)
    y = _mac_core(ring, bank, coeff_idx, mask, rpos, interpret)
    y0r, y0i = _bin0(ring, bank, coeff_idx, mask, rpos)
    return y.at[:, 0, 0].set(y0r).at[:, 1, 0].set(y0i)


def pallas_spectral_mac_shmap(mesh, ring, bank, coeff_idx, mask, t,
                              interpret: bool = False) -> jax.Array:
    """pallas_spectral_mac under an ('f','sp') mesh via shard_map.

    Pallas calls do not auto-partition, so each device runs the kernel on
    its local [F/f, B, 2, N/sp] ring shard against the bank's bin shard —
    no collectives: the MAC is elementwise in filters and bins (SURVEY 5.7,
    the reference's filter-process split of the convolve loop,
    bfrun.c:1745-1754 across forked processes). The DC/Nyquist bin-0 patch
    belongs to global bin 0 only, so it is applied on the first 'sp' shard.
    """
    from jax.sharding import PartitionSpec as P

    B = ring.shape[1]

    def local(ring_l, bank_l, idx_l, mask_l, t_l):
        rpos = jnp.mod(t_l - jnp.arange(B, dtype=jnp.int32), B)
        y = _mac_core(ring_l, bank_l, idx_l, mask_l, rpos, interpret)
        y0r, y0i = _bin0(ring_l, bank_l, idx_l, mask_l, rpos)
        is0 = jax.lax.axis_index("sp") == 0
        y = y.at[:, 0, 0].set(jnp.where(is0, y0r, y[:, 0, 0]))
        y = y.at[:, 1, 0].set(jnp.where(is0, y0i, y[:, 1, 0]))
        return y

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("f", None, None, "sp"), P(None, None, None, "sp"),
                  P("f"), P("f", None), P()),
        out_specs=P("f", None, "sp"),
        check_vma=False,
    )(ring, bank, coeff_idx.astype(jnp.int32), mask, t)


def pallas_shardable(mesh, n_filters: int, n_bins: int, dtype) -> bool:
    """Whether the shard_map kernel path fits this mesh and shape."""
    f = mesh.shape.get("f", 1)
    sp = mesh.shape.get("sp", 1)
    return (n_filters % f == 0
            and n_bins % sp == 0
            and pallas_available(n_bins // sp, dtype))


def pallas_available(n_bins: int, dtype) -> bool:
    """The kernel needs lane-aligned f32 tiles and a TPU (or interpret)."""
    return (dtype == np.float32 and n_bins % 128 == 0 and n_bins >= 256)
