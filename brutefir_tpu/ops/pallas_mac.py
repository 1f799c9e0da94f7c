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
"measured" 107 TB/s that way). All numbers below run the iteration loop
on-device under ``lax.scan`` with a data dependence between iterations
and force completion with a scalar fetch (slope over scan lengths).

Two design points matter (tools/pallas_uniform_probe.py):

* **Static partition unroll.** The in-kernel partition loop is unrolled
  at trace time (B is a static shape). A `fori_loop` version had a
  ~0.35 ms fixed cost at F=26 (loop bookkeeping serializing against the
  VMEM reads); unrolled, the same kernel runs at DMA speed.
* **Lane-tiled persistent state.** The kernel wants [.., 2, N/128, 128]
  blocks; reshaping a flat [.., 2, N] ring per call costs a relayout
  copy (~0.48 ms/block for the 27 MB flagship ring inside a scan). The
  engine therefore keeps the ring and bank tiled whenever the kernel is
  selected (CompiledGraph.tiled), and only the small [F, 2, N]
  per-block spectra pay boundary reshapes (~3-9 us).

MAC-only, in-scan (VMEM-resident ring), flagship shape: **13 us** this
kernel (uniform or distinct coeffs) vs 95 us dense uniform / 178 us
dense rollh. Full device step (decode+FFT+MAC+mix+encode+meters,
device_io.multi_step): **0.167 ms** (uniform) / **0.195 ms** (distinct)
vs 0.275 ms dense — so on TPU the engine selects this kernel wherever
it is applicable (f32, lane-aligned bins); off-TPU the dense path stays
(`runtime/engine.py`). `BRUTEFIR_TPU_MAC` overrides;
``BRUTEFIR_TPU_PALLAS_VARIANT`` picks "row" (whole ring+bank rows
resident in VMEM, partition loop in-kernel) vs "tile" (grid (F, B), one
partition per step -- the fallback when rows exceed the VMEM budget).
Both variants are tested against the dense path (same terms; summation
order differs to float tolerance).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _odt(dtype):
    """Output/accumulator dtype: a bf16 ring (BRUTEFIR_TPU_RING_DTYPE)
    still accumulates and returns f32 (kernels upconvert on load)."""
    return jnp.promote_types(dtype, jnp.float32)


def _mac_kernel(idx_ref, rpos_ref, mask_ref, ring_ref, bank_ref, out_ref):
    # scalar-prefetch: idx [F], rpos [B], mask [F, B] (SMEM)
    # blocks: ring/bank (1, 1, 2, R, 128) at the rotated / gathered rows;
    # out (1, 2, R, 128), accumulated across the innermost partition axis
    f = pl.program_id(0)
    b = pl.program_id(1)
    m = mask_ref[f, b]
    rr = ring_ref[0, 0, 0].astype(out_ref.dtype)
    ri = ring_ref[0, 0, 1].astype(out_ref.dtype)
    hr = bank_ref[0, 0, 0].astype(rr.dtype) * m
    hi = bank_ref[0, 0, 1].astype(rr.dtype) * m

    @pl.when(b == 0)
    def _():
        out_ref[0, 0] = rr * hr - ri * hi
        out_ref[0, 1] = rr * hi + ri * hr

    @pl.when(b > 0)
    def _():
        out_ref[0, 0] += rr * hr - ri * hi
        out_ref[0, 1] += rr * hi + ri * hr


def _mac_kernel_rowmajor(idx_ref, rpos_ref, mask_ref, ring_ref, bank_ref,
                         out_ref, *, n_part):
    # grid (F,): one step holds a filter's whole ring row [B, 2, R, 128]
    # and its gathered bank row in VMEM; the partition loop is STATICALLY
    # UNROLLED (B is a trace-time constant) with the rotation resolved by
    # dynamic VMEM indexing, accumulating in vector registers. The unroll
    # matters: a `fori_loop` version measured a ~0.35 ms fixed cost at
    # F=26 (loop bookkeeping serializes against the VMEM reads); unrolled,
    # the same kernel runs at DMA speed (tools/pallas_uniform_probe.py).
    f = pl.program_id(0)
    accr = jnp.zeros_like(out_ref[0, 0])
    acci = jnp.zeros_like(out_ref[0, 1])
    for b in range(n_part):
        m = mask_ref[f, b]
        rb = rpos_ref[b]
        rr = ring_ref[0, rb, 0].astype(out_ref.dtype)
        ri = ring_ref[0, rb, 1].astype(out_ref.dtype)
        hr = bank_ref[0, b, 0].astype(rr.dtype) * m
        hi = bank_ref[0, b, 1].astype(rr.dtype) * m
        accr += rr * hr - ri * hi
        acci += rr * hi + ri * hr
    out_ref[0, 0] = accr
    out_ref[0, 1] = acci


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
        functools.partial(_mac_kernel_rowmajor, n_part=B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, 2, R, 128), _odt(ring5.dtype)),
        interpret=interpret,
    )(coeff_idx, rpos, maskf, ring5, bank5)


def _mac_kernel_uniform(rpos_ref, mask_ref, ring_ref, bank_ref, out_ref,
                        *, n_part):
    # grid (F,): like _mac_kernel_rowmajor but every filter shares ONE
    # bank row [B, 2, R, 128] whose index map is constant in f — Mosaic's
    # revolving-buffer pipeline then DMAs the bank exactly once for the
    # whole call, cutting bank traffic from F*B*2*N to B*2*N. The mask is
    # a single [B] row (uniform across filters) folded in per partition.
    accr = jnp.zeros_like(out_ref[0, 0])
    acci = jnp.zeros_like(out_ref[0, 1])
    for b in range(n_part):
        m = mask_ref[b]
        rb = rpos_ref[b]
        rr = ring_ref[0, rb, 0].astype(out_ref.dtype)
        ri = ring_ref[0, rb, 1].astype(out_ref.dtype)
        hr = bank_ref[b, 0].astype(rr.dtype) * m
        hi = bank_ref[b, 1].astype(rr.dtype) * m
        accr += rr * hr - ri * hi
        acci += rr * hi + ri * hr
    out_ref[0, 0] = accr
    out_ref[0, 1] = acci


def _uniform_call(ring5, bank_row4, rpos, mask_row, interpret):
    F, B, _, R, _ = ring5.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, B, 2, R, 128),
                         lambda f, rp, mk: (f, 0, 0, 0, 0)),
            pl.BlockSpec((B, 2, R, 128), lambda f, rp, mk: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, R, 128), lambda f, rp, mk: (f, 0, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_mac_kernel_uniform, n_part=B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, 2, R, 128), _odt(ring5.dtype)),
        interpret=interpret,
    )(rpos, mask_row, ring5, bank_row4)


def pallas_spectral_mac_uniform(ring: jax.Array, bank: jax.Array,
                                coeff_idx: jax.Array, mask: jax.Array,
                                t: jax.Array,
                                interpret: bool = False) -> jax.Array:
    """pallas_spectral_mac when every filter uses the same coefficient row.

    Fused-kernel counterpart of partconv.spectral_mac_uniform (the
    reference's bench2 massive workload drives all 26 filters from one
    coeff, bfconf `coeff: 0`): the shared [B, 2, N] bank row is gathered
    once (already rotation-composed via ``rpos`` on the ring side — the
    kernel rotates the *ring* read, so the bank row is taken unrotated)
    and stays VMEM-resident across the filter grid. Signature matches
    spectral_mac_uniform; only ``coeff_idx[0]`` / ``mask[0]`` are read.
    """
    if ring.ndim == 5:
        F, B, _, R, _ = ring.shape
        N = R * 128
        ring5 = ring
        bank_row = bank[coeff_idx[0]].reshape(B, 2, R, 128)
    else:
        F, B, _, N = ring.shape
        R = N // 128
        ring5 = ring.reshape(F, B, 2, R, 128)
        bank_row = bank[coeff_idx[0]].reshape(B, 2, R, 128)
    rpos = jnp.mod(t - jnp.arange(B, dtype=jnp.int32), B).astype(jnp.int32)
    mask_row = mask[0].astype(_odt(ring.dtype))
    y5 = _uniform_call(ring5, bank_row, rpos, mask_row, interpret)
    y = y5.reshape(F, 2, N)
    y0r, y0i = _bin0(ring, bank, coeff_idx, mask, rpos)
    return y.at[:, 0, 0].set(y0r).at[:, 1, 0].set(y0i)


def _mac_core(ring: jax.Array, bank: jax.Array, coeff_idx: jax.Array,
              mask: jax.Array, rpos: jax.Array,
              interpret: bool = False) -> jax.Array:
    """The kernel proper: all bins as normal complex lanes (no bin-0 patch).

    Accepts ring/bank in the engine's tiled layout [.., 2, N/128, 128]
    (preferred: no relayout) or untiled [.., 2, N] (reshaped here — fine
    for one-shot calls, but a reshape of the flagship ring inside a scan
    measured ~0.48 ms/block, so persistent state should stay tiled).
    """
    if ring.ndim == 5:
        F, B, _, R, _ = ring.shape
        N = R * 128
        ring5 = ring
        bank5 = (bank if bank.ndim == 5
                 else bank.reshape(bank.shape[0], B, 2, R, 128))
    else:
        F, B, _, N = ring.shape
        R = N // 128
        ring5 = ring.reshape(F, B, 2, R, 128)
        bank5 = bank.reshape(bank.shape[0], B, 2, R, 128)
    maskf = mask.astype(_odt(ring.dtype))

    # Variant: "row" keeps a filter's whole [B, 2, N] ring+bank rows in
    # VMEM and loops partitions in-kernel (one DMA pass total; the
    # measured winner at flagship scale, F<=~64); "chunked" (grid
    # (R/Rc, F), register accumulators) wins at the big-F scale shapes
    # where the MAC is HBM/VMEM-traffic-bound (256 filters x 16 x 8192:
    # 1.47 vs 1.80 ms/block); "tile" (grid (F, B)) streams one partition
    # per step and is the fallback when rows exceed the VMEM budget.
    import os
    variant = os.environ.get("BRUTEFIR_TPU_PALLAS_VARIANT", "auto")
    row_bytes = B * 2 * N * 4
    if variant == "auto":
        if 4 * row_bytes > 12 * 2**20:
            variant = "tile"
        elif F * row_bytes >= 100 * 2**20 and R % 8 == 0:
            variant = "chunked"
        else:
            variant = "row"
    if variant == "chunked":
        y5 = _chunked_call(ring5, bank5, coeff_idx.astype(jnp.int32),
                           rpos, maskf, interpret)
    elif variant == "row":
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
            out_shape=jax.ShapeDtypeStruct((F, 2, R, 128), _odt(ring.dtype)),
            interpret=interpret,
        )(coeff_idx.astype(jnp.int32), rpos, maskf, ring5, bank5)
    return y5.reshape(F, 2, N)


def _bin0(ring, bank, coeff_idx, mask, rpos):
    """Bin 0 packs DC and Nyquist: real/imag planes multiply independently."""
    r0 = ring[..., 0, 0] if ring.ndim == 5 else ring[..., 0]   # [F, B, 2]
    b0 = bank[..., 0, 0] if bank.ndim == 5 else bank[..., 0]   # [E, B, 2]
    rot0 = jnp.take(r0, rpos, axis=1)                          # [F, B, 2]
    h0 = jnp.take(b0, coeff_idx, axis=0) * mask[:, :, None]
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


def _mac_kernel_chunked_reg(idx_ref, rpos_ref, mask_ref, ring_ref, bank_ref,
                            out_ref, *, n_part, n_sub):
    # Big-shape variant (grid (R/Rc, F)): bin-chunked blocks with a
    # loop interchange -- outer over vreg-sized sublane chunks, inner
    # over partitions -- so the accumulators live in vector registers
    # instead of round-tripping VMEM per partition. Measured at the
    # 256-filter scale shape: 1.47 ms/block vs 1.80 row / 2.44 tile
    # (same terms, bit-identical result; /tmp probes round 3).
    f = pl.program_id(1)
    Rc = out_ref.shape[2]
    for s in range(0, Rc, n_sub):
        accr = None
        acci = None
        for b in range(n_part):
            m = mask_ref[f, b]
            rb = rpos_ref[b]
            rr = ring_ref[0, rb, 0, pl.ds(s, n_sub)].astype(out_ref.dtype)
            ri = ring_ref[0, rb, 1, pl.ds(s, n_sub)].astype(out_ref.dtype)
            hr = bank_ref[0, b, 0, pl.ds(s, n_sub)].astype(rr.dtype) * m
            hi = bank_ref[0, b, 1, pl.ds(s, n_sub)].astype(rr.dtype) * m
            tr = rr * hr - ri * hi
            ti = rr * hi + ri * hr
            accr = tr if accr is None else accr + tr
            acci = ti if acci is None else acci + ti
        out_ref[0, 0, pl.ds(s, n_sub)] = accr
        out_ref[0, 1, pl.ds(s, n_sub)] = acci


def _chunked_call(ring5, bank5, coeff_idx, rpos, maskf, interpret,
                  chunk_rows: int = 16, n_sub: int = 16):
    F, B, _, R, _ = ring5.shape
    Rc = chunk_rows if R % chunk_rows == 0 else R
    sub = n_sub if Rc % n_sub == 0 else Rc
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R // Rc, F),
        in_specs=[
            pl.BlockSpec((1, B, 2, Rc, 128),
                         lambda r, f, idx, rp, mk: (f, 0, 0, r, 0)),
            pl.BlockSpec((1, B, 2, Rc, 128),
                         lambda r, f, idx, rp, mk: (idx[f], 0, 0, r, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, Rc, 128),
                               lambda r, f, idx, rp, mk: (f, 0, r, 0)),
    )
    return pl.pallas_call(
        functools.partial(_mac_kernel_chunked_reg, n_part=B, n_sub=sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, 2, R, 128), _odt(ring5.dtype)),
        interpret=interpret,
    )(coeff_idx, rpos, maskf, ring5, bank5)


def _mac_kernel_rowmajor_dual(idx_ref, pidx_ref, rpos_ref, mask_ref,
                              pmask_ref, ring_ref, bank_ref, pbank_ref,
                              out_ref, pout_ref, *, n_part):
    # Crossfade dual MAC (grid (F,)): one pass over the filter's ring row
    # computes BOTH the new-coefficient and previous-coefficient spectra
    # (the crossfade branch of bfrun.c:1695-1777 runs the partition loop
    # twice). The ring row -- the traffic that scales with B -- is read
    # once instead of twice; only the second bank row is extra.
    f = pl.program_id(0)
    accr = jnp.zeros_like(out_ref[0, 0])
    acci = jnp.zeros_like(out_ref[0, 1])
    paccr = jnp.zeros_like(out_ref[0, 0])
    pacci = jnp.zeros_like(out_ref[0, 1])
    for b in range(n_part):
        rb = rpos_ref[b]
        rr = ring_ref[0, rb, 0].astype(out_ref.dtype)
        ri = ring_ref[0, rb, 1].astype(out_ref.dtype)
        m = mask_ref[f, b]
        hr = bank_ref[0, b, 0].astype(rr.dtype) * m
        hi = bank_ref[0, b, 1].astype(rr.dtype) * m
        accr += rr * hr - ri * hi
        acci += rr * hi + ri * hr
        pm = pmask_ref[f, b]
        phr = pbank_ref[0, b, 0].astype(rr.dtype) * pm
        phi = pbank_ref[0, b, 1].astype(rr.dtype) * pm
        paccr += rr * phr - ri * phi
        pacci += rr * phi + ri * phr
    out_ref[0, 0] = accr
    out_ref[0, 1] = acci
    pout_ref[0, 0] = paccr
    pout_ref[0, 1] = pacci


def _mac_kernel_uniform_dual(rpos_ref, mask_ref, pmask_ref, ring_ref,
                             bank_ref, pbank_ref, out_ref, pout_ref,
                             *, n_part):
    # uniform-coefficient dual MAC: both shared bank rows have constant
    # index maps, so Mosaic DMAs each exactly once for the whole grid
    accr = jnp.zeros_like(out_ref[0, 0])
    acci = jnp.zeros_like(out_ref[0, 1])
    paccr = jnp.zeros_like(out_ref[0, 0])
    pacci = jnp.zeros_like(out_ref[0, 1])
    for b in range(n_part):
        rb = rpos_ref[b]
        rr = ring_ref[0, rb, 0].astype(out_ref.dtype)
        ri = ring_ref[0, rb, 1].astype(out_ref.dtype)
        m = mask_ref[b]
        hr = bank_ref[b, 0].astype(rr.dtype) * m
        hi = bank_ref[b, 1].astype(rr.dtype) * m
        accr += rr * hr - ri * hi
        acci += rr * hi + ri * hr
        pm = pmask_ref[b]
        phr = pbank_ref[b, 0].astype(rr.dtype) * pm
        phi = pbank_ref[b, 1].astype(rr.dtype) * pm
        paccr += rr * phr - ri * phi
        pacci += rr * phi + ri * phr
    out_ref[0, 0] = accr
    out_ref[0, 1] = acci
    pout_ref[0, 0] = paccr
    pout_ref[0, 1] = pacci


_DUAL_VMEM_BUDGET = 12 * 2**20


def _dual_core(ring, bank, coeff_idx, mask, prev_idx, prev_mask, rpos,
               uniform: bool, interpret: bool):
    """Unpatched dual MAC: (Y_new, Y_old) with bin 0 as plain complex
    lanes (callers patch, like _mac_core)."""
    if ring.ndim == 5:
        F, B, _, R, _ = ring.shape
        N = R * 128
        ring5 = ring
        bank5 = (bank if bank.ndim == 5
                 else bank.reshape(bank.shape[0], B, 2, R, 128))
    else:
        F, B, _, N = ring.shape
        R = N // 128
        ring5 = ring.reshape(F, B, 2, R, 128)
        bank5 = bank.reshape(bank.shape[0], B, 2, R, 128)
    row_bytes = B * 2 * N * 4
    if 6 * row_bytes > _DUAL_VMEM_BUDGET:
        # beyond the dual rowmajor VMEM budget (three resident rows,
        # double-buffered): two plain passes, which pick their own
        # big-shape variants
        return (_mac_core(ring, bank, coeff_idx, mask, rpos, interpret),
                _mac_core(ring, bank, prev_idx, prev_mask, rpos, interpret))
    out_sh = [jax.ShapeDtypeStruct((F, 2, R, 128), _odt(ring.dtype))] * 2
    if uniform:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F,),
            in_specs=[
                pl.BlockSpec((1, B, 2, R, 128),
                             lambda f, rp, mk, pmk: (f, 0, 0, 0, 0)),
                pl.BlockSpec((B, 2, R, 128),
                             lambda f, rp, mk, pmk: (0, 0, 0, 0)),
                pl.BlockSpec((B, 2, R, 128),
                             lambda f, rp, mk, pmk: (0, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 2, R, 128), lambda f, rp, mk, pmk:
                             (f, 0, 0, 0)),
                pl.BlockSpec((1, 2, R, 128), lambda f, rp, mk, pmk:
                             (f, 0, 0, 0)),
            ],
        )
        y5, p5 = pl.pallas_call(
            functools.partial(_mac_kernel_uniform_dual, n_part=B),
            grid_spec=grid_spec,
            out_shape=out_sh,
            interpret=interpret,
        )(rpos, mask[0].astype(_odt(ring.dtype)),
          prev_mask[0].astype(_odt(ring.dtype)),
          ring5, bank5[coeff_idx[0]], bank5[prev_idx[0]])
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(F,),
            in_specs=[
                pl.BlockSpec((1, B, 2, R, 128),
                             lambda f, i, pi, rp, mk, pmk: (f, 0, 0, 0, 0)),
                pl.BlockSpec((1, B, 2, R, 128),
                             lambda f, i, pi, rp, mk, pmk:
                             (i[f], 0, 0, 0, 0)),
                pl.BlockSpec((1, B, 2, R, 128),
                             lambda f, i, pi, rp, mk, pmk:
                             (pi[f], 0, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 2, R, 128), lambda f, i, pi, rp, mk, pmk:
                             (f, 0, 0, 0)),
                pl.BlockSpec((1, 2, R, 128), lambda f, i, pi, rp, mk, pmk:
                             (f, 0, 0, 0)),
            ],
        )
        y5, p5 = pl.pallas_call(
            functools.partial(_mac_kernel_rowmajor_dual, n_part=B),
            grid_spec=grid_spec,
            out_shape=out_sh,
            interpret=interpret,
        )(coeff_idx.astype(jnp.int32), prev_idx.astype(jnp.int32), rpos,
          mask.astype(_odt(ring.dtype)), prev_mask.astype(_odt(ring.dtype)),
          ring5, bank5, bank5)
    return y5.reshape(F, 2, N), p5.reshape(F, 2, N)


def pallas_spectral_mac_dual(ring, bank, coeff_idx, mask, prev_idx,
                             prev_mask, t, uniform: bool = False,
                             interpret: bool = False):
    """One ring pass, two coefficient sets: returns (Y_new, Y_old).

    The crossfade path (`convolver_crossfade_inplace` driven from
    bfrun.c:1695-1777) needs the block convolved against both the new and
    the previous coefficients. Two separate MAC calls stream the
    [F, B, 2, N] ring twice; this kernel reads each ring row once and
    accumulates both products, so a crossfade block's MAC traffic drops
    from 2x(ring+bank) to ring+2xbank (uniform: both shared bank rows
    are DMAd once for the whole grid). Falls back to two plain passes
    when the three VMEM-resident rows exceed the budget.
    """
    B = ring.shape[1]
    rpos = jnp.mod(t - jnp.arange(B, dtype=jnp.int32), B).astype(jnp.int32)
    y, p = _dual_core(ring, bank, coeff_idx, mask, prev_idx, prev_mask,
                      rpos, uniform, interpret)
    y0r, y0i = _bin0(ring, bank, coeff_idx, mask, rpos)
    p0r, p0i = _bin0(ring, bank, prev_idx, prev_mask, rpos)
    return (y.at[:, 0, 0].set(y0r).at[:, 1, 0].set(y0i),
            p.at[:, 0, 0].set(p0r).at[:, 1, 0].set(p0i))


def pallas_spectral_mac_dual_shmap(mesh, ring, bank, coeff_idx, mask,
                                   prev_idx, prev_mask, t,
                                   uniform: bool = False,
                                   interpret: bool = False):
    """pallas_spectral_mac_dual under an ('f','sp') mesh (see
    pallas_spectral_mac_shmap: filters and bins shard without
    collectives; the bin-0 patch applies on the first 'sp' shard only,
    whose local bin 0 is the global packed DC/Nyquist bin)."""
    from jax.sharding import PartitionSpec as P

    def local(ring_l, bank_l, idx_l, mask_l, pidx_l, pmask_l, t_l):
        B = ring_l.shape[1]
        rpos = jnp.mod(t_l - jnp.arange(B, dtype=jnp.int32), B)
        y, p = _dual_core(ring_l, bank_l, idx_l, mask_l, pidx_l, pmask_l,
                          rpos, uniform, interpret)
        is0 = jax.lax.axis_index("sp") == 0
        y0r, y0i = _bin0(ring_l, bank_l, idx_l, mask_l, rpos)
        p0r, p0i = _bin0(ring_l, bank_l, pidx_l, pmask_l, rpos)
        y = y.at[:, 0, 0].set(jnp.where(is0, y0r, y[:, 0, 0]))
        y = y.at[:, 1, 0].set(jnp.where(is0, y0i, y[:, 1, 0]))
        p = p.at[:, 0, 0].set(jnp.where(is0, p0r, p[:, 0, 0]))
        p = p.at[:, 1, 0].set(jnp.where(is0, p0i, p[:, 1, 0]))
        return y, p

    if ring.ndim == 5:
        ring_spec = P("f", None, None, "sp", None)
        bank_spec = P(None, None, None, "sp", None)
    else:
        ring_spec = P("f", None, None, "sp")
        bank_spec = P(None, None, None, "sp")
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(ring_spec, bank_spec, P("f"), P("f", None), P("f"),
                  P("f", None), P()),
        out_specs=(P("f", None, "sp"), P("f", None, "sp")),
        check_vma=False,
    )(ring, bank, coeff_idx.astype(jnp.int32), mask,
      prev_idx.astype(jnp.int32), prev_mask, t)


def _mac_mix_kernel_rowmajor(idx_ref, rpos_ref, mask_ref, w_ref, ring_ref,
                             bank_ref, out_ref, *, n_part, n_out):
    # grid (F,): the per-filter MAC exactly as _mac_kernel_rowmajor, then
    # the output-mix contraction folded in: out[c] += w[f, c] * y_f, with
    # the [C_out, 2, R, 128] output block VMEM-resident across the whole
    # grid (constant index map -> revolving buffer). Y is never
    # materialized in HBM.
    f = pl.program_id(0)
    accr = jnp.zeros_like(out_ref[0, 0])
    acci = jnp.zeros_like(out_ref[0, 1])
    for b in range(n_part):
        m = mask_ref[f, b]
        rb = rpos_ref[b]
        rr = ring_ref[0, rb, 0].astype(out_ref.dtype)
        ri = ring_ref[0, rb, 1].astype(out_ref.dtype)
        hr = bank_ref[0, b, 0].astype(rr.dtype) * m
        hi = bank_ref[0, b, 1].astype(rr.dtype) * m
        accr += rr * hr - ri * hi
        acci += rr * hi + ri * hr

    @pl.when(f == 0)
    def _():
        for c in range(n_out):
            out_ref[c, 0] = w_ref[f, c] * accr
            out_ref[c, 1] = w_ref[f, c] * acci

    @pl.when(f > 0)
    def _():
        for c in range(n_out):
            out_ref[c, 0] += w_ref[f, c] * accr
            out_ref[c, 1] += w_ref[f, c] * acci


def _mac_mix_kernel_uniform(rpos_ref, mask_ref, w_ref, ring_ref, bank_ref,
                            out_ref, *, n_part, n_out):
    # the shared-coefficient variant: one bank row, DMAd once (constant
    # index map), mixed into the persistent output block
    f = pl.program_id(0)
    accr = jnp.zeros_like(out_ref[0, 0])
    acci = jnp.zeros_like(out_ref[0, 1])
    for b in range(n_part):
        m = mask_ref[b]
        rb = rpos_ref[b]
        rr = ring_ref[0, rb, 0].astype(out_ref.dtype)
        ri = ring_ref[0, rb, 1].astype(out_ref.dtype)
        hr = bank_ref[b, 0].astype(rr.dtype) * m
        hi = bank_ref[b, 1].astype(rr.dtype) * m
        accr += rr * hr - ri * hi
        acci += rr * hi + ri * hr

    @pl.when(f == 0)
    def _():
        for c in range(n_out):
            out_ref[c, 0] = w_ref[f, c] * accr
            out_ref[c, 1] = w_ref[f, c] * acci

    @pl.when(f > 0)
    def _():
        for c in range(n_out):
            out_ref[c, 0] += w_ref[f, c] * accr
            out_ref[c, 1] += w_ref[f, c] * acci


def mix_fusable(F: int, B: int, K: int, C_out: int) -> bool:
    """Can the fused MAC+mix run at this shape? Small shapes keep the
    whole [C_out, 2, K] output VMEM-resident (grid (F,)); big shapes
    need the bin-tiled MXU variant, which requires 8-row bin chunks and
    fits its chunks + scratch in the VMEM budget."""
    R = K // 128
    out_bytes = C_out * 2 * R * 128 * 4
    row_bytes = B * 2 * R * 128 * 4
    if out_bytes + 4 * row_bytes <= 12 * 2**20:
        return True
    if R % 16 != 0:
        return False
    Rc = 16
    Fc = 128 if F % 128 == 0 else F
    chunk = (C_out * 2 * Rc * 128 * 4          # resident output chunk
             + Fc * 2 * Rc * 128 * 4           # Y scratch
             + 4 * B * 2 * Rc * 128 * 4)       # double-buffered ring+bank
    return chunk <= 12 * 2**20


def _mac_mix_kernel_tiled(idx_ref, rpos_ref, mask_ref, ring_ref, bank_ref,
                          w_ref, out_ref, y_scr, *, n_part, n_fc):
    # Big-shape fused MAC+mix (grid (R/Rc, F/Fc, Fc), innermost fl):
    # the [C_out, 2, R, 128] output cannot sit in VMEM at 256 outputs
    # (16.8 MB > ~16 MB/core), so the output block is BIN-TILED (index
    # map depends only on r) and the mix contraction runs on the MXU:
    # each fl step MACs one filter's ring row chunk into a [Fc, 2, Rc,
    # 128] VMEM scratch; on the tile's last filter, w[C, Fc] contracts
    # the scratch in 2*Rc [C, Fc] x [Fc, 128] dots accumulated into the
    # resident output chunk. Ring/bank HBM traffic is identical to the
    # unfused chunked MAC; the per-filter Y spectra never reach HBM.
    r, ft, fl = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    f = ft * n_fc + fl
    Rc = out_ref.shape[2]
    accr = jnp.zeros_like(out_ref[0, 0])
    acci = jnp.zeros_like(out_ref[0, 1])
    for b in range(n_part):
        m = mask_ref[f, b]
        rb = rpos_ref[b]
        rr = ring_ref[0, rb, 0].astype(out_ref.dtype)
        ri = ring_ref[0, rb, 1].astype(out_ref.dtype)
        hr = bank_ref[0, b, 0].astype(rr.dtype) * m
        hi = bank_ref[0, b, 1].astype(rr.dtype) * m
        accr += rr * hr - ri * hi
        acci += rr * hi + ri * hr
    y_scr[fl, 0] = accr
    y_scr[fl, 1] = acci

    @pl.when(fl == n_fc - 1)
    def _():
        wt = w_ref[...]                                  # [C_out, Fc]
        parts = []
        for p in (0, 1):
            rows = [jax.lax.dot(wt, y_scr[:, p, i],
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=out_ref.dtype)
                    for i in range(Rc)]                  # [C_out, 128] each
            parts.append(jnp.stack(rows, axis=1))        # [C_out, Rc, 128]
        contrib = jnp.stack(parts, axis=1)               # [C_out, 2, Rc, 128]

        @pl.when(ft == 0)
        def _():
            out_ref[...] = contrib

        @pl.when(ft > 0)
        def _():
            out_ref[...] += contrib


def _tiled_mix_call(ring5, bank5, coeff_idx, rpos, maskf, wf_t, interpret,
                    chunk_rows: int = None, chunk_f: int = None):
    """Dispatch the bin-tiled fused MAC+mix. ``wf_t``: [C_out, F] f32."""
    # Rc=16 / Fc=128: the measured winner at 256ch x 8k bins (1.796 vs
    # 1.820 ms unfused; Rc=8 1.97, Fc=256 1.94). Some off-default
    # combinations (Fc=64, Rc=4) trip a jax-internal tracing KeyError
    # ('closed_call') on jax 0.8 -- keep the knobs for re-sweeps but
    # treat non-default values as experimental.
    import os
    if chunk_rows is None:
        chunk_rows = int(os.environ.get("BRUTEFIR_TPU_MIXTILE_RC", "16"))
    if chunk_f is None:
        chunk_f = int(os.environ.get("BRUTEFIR_TPU_MIXTILE_FC", "128"))
    F, B, _, R, _ = ring5.shape
    C_out = wf_t.shape[0]
    Rc = chunk_rows if R % chunk_rows == 0 else R
    Fc = chunk_f if F % chunk_f == 0 else F

    def _chunk_bytes(rc, fc):
        return ((C_out + fc + 4 * B) * 2 * rc * 128 * 4)

    if _chunk_bytes(Rc, Fc) > 12 * 2**20:
        # a knob override (or a non-dividing R falling back to Rc=R)
        # produced chunks past the budget mix_fusable validated with the
        # defaults -- use the defaults rather than a VMEM-overflow
        # compile failure at first dispatch
        Rc = 16 if R % 16 == 0 else R
        Fc = 128 if F % 128 == 0 else F
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R // Rc, F // Fc, Fc),
        in_specs=[
            pl.BlockSpec((1, B, 2, Rc, 128),
                         lambda r, ft, fl, idx, rp, mk, _fc=Fc:
                         (ft * _fc + fl, 0, 0, r, 0)),
            pl.BlockSpec((1, B, 2, Rc, 128),
                         lambda r, ft, fl, idx, rp, mk, _fc=Fc:
                         (idx[ft * _fc + fl], 0, 0, r, 0)),
            pl.BlockSpec((C_out, Fc),
                         lambda r, ft, fl, idx, rp, mk: (0, ft)),
        ],
        out_specs=pl.BlockSpec((C_out, 2, Rc, 128),
                               lambda r, ft, fl, idx, rp, mk: (0, 0, r, 0)),
        scratch_shapes=[pltpu.VMEM((Fc, 2, Rc, 128), _odt(ring5.dtype))],
    )
    return pl.pallas_call(
        functools.partial(_mac_mix_kernel_tiled, n_part=B, n_fc=Fc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C_out, 2, R, 128),
                                       _odt(ring5.dtype)),
        interpret=interpret,
    )(coeff_idx.astype(jnp.int32), rpos, maskf, ring5, bank5, wf_t)


def _mac_mix_kernel_tiled_group(idx_ref, rposg_ref, dly_ref, mask_ref,
                                ring_ref, xnew_ref, bank_ref, w_ref,
                                *refs, n_part, n_fc, n_grp, w_trans):
    # G consecutive blocks' fused MAC+mix in ONE pass over the ring row
    # and the coefficient bank row (grid (R/Rc, F/Fc, Fc), innermost fl).
    # Controls are frozen across the group (the batched-offline dispatch
    # contract), so all G blocks share the bank row and the mask. The
    # ring operand is the state after block t's write and BEFORE any
    # later block's; block t+g's partition b reads the write of time
    # t+g-b-delay[f], which is either already in the ring (g-b-delay <=
    # 0), one of the group's own later spectra passed separately as
    # ``xnew[g-b-delay-1]`` (g-b-delay >= 1), or a partition
    # >= B - delay that the host's cblocks clamp (control._cblocks,
    # mirroring bfrun.c:1585-1591) always masks to zero. Per-block HBM
    # traffic: the bank row is read once per GROUP and the ring row once
    # plus G-1 xnew slots -- ~0.53x (G=2) / ~0.27x (G=4) the
    # per-block-dispatch traffic at B=16, on a MAC that is otherwise at
    # the HBM roofline (docs/PERFORMANCE.md).
    outs = refs[:n_grp]
    scrs = refs[n_grp:]
    r, ft, fl = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    f = ft * n_fc + fl
    Rc = outs[0].shape[2]
    dly = dly_ref[f]
    odt = outs[0].dtype
    accs = [[jnp.zeros_like(outs[0][0, 0]), jnp.zeros_like(outs[0][0, 1])]
            for _ in range(n_grp)]
    for b in range(n_part):
        m = mask_ref[f, b]
        hr = bank_ref[0, b, 0].astype(odt) * m
        hi = bank_ref[0, b, 1].astype(odt) * m
        for g in range(n_grp):
            rb = rposg_ref[g, b]
            rr = ring_ref[0, rb, 0].astype(odt)
            ri = ring_ref[0, rb, 1].astype(odt)
            if b < g:   # only then can g - b - dly - 1 reach >= 0
                # block t+g partition b needs write time t+g-b-dly; for
                # dly in [0, g-b-1] that is the group's own spectra
                # xnew[g-b-1-dly]. Unrolled with STATIC xnew indices --
                # a traced sublane index here measured +0.7 ms/block at
                # the 256ch scale shape (Mosaic lowers the dynamic load
                # far worse than a select chain).
                for jj in range(g - b):
                    sel = dly == (g - b - 1 - jj)
                    rr = jnp.where(sel, xnew_ref[0, jj, 0].astype(odt),
                                   rr)
                    ri = jnp.where(sel, xnew_ref[0, jj, 1].astype(odt),
                                   ri)
            accs[g][0] += rr * hr - ri * hi
            accs[g][1] += rr * hi + ri * hr
    for g in range(n_grp):
        scrs[g][fl, 0] = accs[g][0]
        scrs[g][fl, 1] = accs[g][1]

    @pl.when(fl == n_fc - 1)
    def _():
        # w arrives [C_out, Fc] when Fc % 128 == 0 (Mosaic lane
        # legality; the measured-fast lax.dot path) and TRANSPOSED
        # [Fc, C_out] otherwise (small-Fc groups), contracted over the
        # leading axis via dot_general -- same MXU product, same
        # HIGHEST precision either way.
        wt = w_ref[...]
        dn = (((0,), (0,)), ((), ()))
        for scr, oref in zip(scrs, outs):
            parts = []
            for p in (0, 1):
                if w_trans:
                    rows = [jax.lax.dot_general(
                                wt, scr[:, p, i], dn,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=oref.dtype)
                            for i in range(Rc)]          # [C_out, 128] each
                else:
                    rows = [jax.lax.dot(
                                wt, scr[:, p, i],
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=oref.dtype)
                            for i in range(Rc)]          # [C_out, 128] each
                parts.append(jnp.stack(rows, axis=1))    # [C_out, Rc, 128]
            contrib = jnp.stack(parts, axis=1)           # [C_out, 2, Rc, 128]

            @pl.when(ft == 0)
            def _(oref=oref, contrib=contrib):
                oref[...] = contrib

            @pl.when(ft > 0)
            def _(oref=oref, contrib=contrib):
                oref[...] += contrib


def _group_vmem_units(G: int, B: int, Rc: int, Fc: int, C_out: int) -> int:
    """VMEM estimate in bytes: G DOUBLE-BUFFERED output chunks (Mosaic
    double-buffers output windows across the r axis -- measured on
    hardware: the G=4/C_out=256 variant compiles to an 18.55M scoped
    allocation, 16M of it the 2*G*C_out output windows, and is rejected
    by the backend's 16M scoped-vmem limit) + G single Y scratches +
    double-buffered ring/bank/xnew blocks, in [2, Rc, 128] f32 units."""
    return ((2 * G * C_out + G * Fc + 4 * B + 4 * (G - 1))
            * 2 * Rc * 128 * 4)


def _group_tiles(G: int, F: int, B: int, R: int, C_out: int):
    """Rc/Fc for the group kernel (env-tunable). Mosaic requires the
    block sublane dim (Rc) to be a multiple of 8 or equal to R, and the
    double-buffered output windows cost 2*G*C_out units regardless of
    Fc, so G shrinks Fc only until that floor hits the budget: at the
    256-output scale shape G=2 fits (Rc=8/Fc=128, the measured winner)
    and G>=3 is structurally over budget -- group_size falls back to 2."""
    import os

    def legal(rc, fc):
        return (R % rc == 0 and (rc % 8 == 0 or rc == R)
                and F % fc == 0)

    def fits(rc, fc):
        return _group_vmem_units(G, B, rc, fc, C_out) <= 12 * 2**20

    Rc = int(os.environ.get("BRUTEFIR_TPU_PAIRTILE_RC", "0"))
    Fc = int(os.environ.get("BRUTEFIR_TPU_PAIRTILE_FC", "0"))
    if Rc > 0 and Fc > 0 and legal(Rc, Fc) and fits(Rc, Fc):
        return Rc, Fc
    for rc in (8, R):
        for fc in (128, 64, 32, 16, 8):
            if legal(rc, fc) and fits(rc, fc):
                return rc, fc
    return R, F   # group_mix_fusable rejects when this overflows


def group_mix_fusable(G: int, F: int, B: int, K: int, C_out: int) -> bool:
    """Can the G-block fused MAC+mix run at this shape (VMEM budget)?"""
    if K % 128 != 0 or G < 2:
        return False
    R = K // 128
    Rc, Fc = _group_tiles(G, F, B, R, C_out)
    return _group_vmem_units(G, B, Rc, Fc, C_out) <= 12 * 2**20


def pair_mix_fusable(F: int, B: int, K: int, C_out: int) -> bool:
    return group_mix_fusable(2, F, B, K, C_out)


def _tiled_mix_group_call(ring5, xnew6, bank5, coeff_idx, rposg, dly,
                          maskf, w, interpret):
    """``w``: the output mix [C_out, F]; passed to the kernel untransposed
    when Fc % 128 == 0 (Mosaic lane legality, the measured-fast layout)
    and transposed otherwise (see the kernel's lane-legality note)."""
    F, B, _, R, _ = ring5.shape
    G = xnew6.shape[1] + 1
    C_out = w.shape[0]
    Rc, Fc = _group_tiles(G, F, B, R, C_out)
    odt = _odt(ring5.dtype)
    w_trans = Fc % 128 != 0
    w_arg = jnp.transpose(w) if w_trans else w
    w_spec = (pl.BlockSpec((Fc, C_out),
                           lambda r, ft, fl, idx, rp, dl, mk: (ft, 0))
              if w_trans else
              pl.BlockSpec((C_out, Fc),
                           lambda r, ft, fl, idx, rp, dl, mk: (0, ft)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(R // Rc, F // Fc, Fc),
        in_specs=[
            pl.BlockSpec((1, B, 2, Rc, 128),
                         lambda r, ft, fl, idx, rp, dl, mk, _fc=Fc:
                         (ft * _fc + fl, 0, 0, r, 0)),
            pl.BlockSpec((1, G - 1, 2, Rc, 128),
                         lambda r, ft, fl, idx, rp, dl, mk, _fc=Fc:
                         (ft * _fc + fl, 0, 0, r, 0)),
            pl.BlockSpec((1, B, 2, Rc, 128),
                         lambda r, ft, fl, idx, rp, dl, mk, _fc=Fc:
                         (idx[ft * _fc + fl], 0, 0, r, 0)),
            w_spec,
        ],
        out_specs=[pl.BlockSpec((C_out, 2, Rc, 128),
                                lambda r, ft, fl, idx, rp, dl, mk:
                                (0, 0, r, 0))] * G,
        scratch_shapes=[pltpu.VMEM((Fc, 2, Rc, 128), odt)] * G,
    )
    return pl.pallas_call(
        functools.partial(_mac_mix_kernel_tiled_group, n_part=B, n_fc=Fc,
                          n_grp=G, w_trans=w_trans),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((C_out, 2, R, 128), odt)] * G,
        interpret=interpret,
    )(coeff_idx.astype(jnp.int32), rposg, dly.astype(jnp.int32),
      maskf, ring5, xnew6, bank5, w_arg)


def _mac_kernel_rowmajor_group(idx_ref, rposg_ref, dly_ref, mask_ref,
                               ring_ref, xnew_ref, bank_ref, *outs,
                               n_part, n_grp):
    # Unfused grouped MAC: grid (F,), one step holds a filter's whole
    # ring row, its gathered bank row, and the group's G-1 side-channel
    # spectra in VMEM; emits G per-filter spectra (the output mix runs
    # OUTSIDE as a separate matmul). Exists for G >= 3: the fused
    # MAC+mix form's 2*G*C_out double-buffered output windows are
    # structurally over the scoped-VMEM budget there (_group_vmem_units)
    # while these [1, 2, R, 128] per-filter outputs stay tiny -- the
    # ring+bank rows are still read once per GROUP, so per-block HBM
    # traffic falls ~B/(B/G + 3G/...): at the 256ch scale shape G=4 trades
    # ~134 MB/block of ring+bank for ~50 MB/block of Y+mix traffic.
    # Same per-block terms in the same b-ascending accumulation order as
    # G unfused per-block steps (run_mac + complex_mix); the xnew
    # selection mirrors _mac_mix_kernel_tiled_group exactly.
    f = pl.program_id(0)
    dly = dly_ref[f]
    odt = outs[0].dtype
    accs = [[jnp.zeros_like(outs[0][0, 0]), jnp.zeros_like(outs[0][0, 1])]
            for _ in range(n_grp)]
    for b in range(n_part):
        m = mask_ref[f, b]
        hr = bank_ref[0, b, 0].astype(odt) * m
        hi = bank_ref[0, b, 1].astype(odt) * m
        for g in range(n_grp):
            rb = rposg_ref[g, b]
            rr = ring_ref[0, rb, 0].astype(odt)
            ri = ring_ref[0, rb, 1].astype(odt)
            if b < g:   # only then can g - b - dly - 1 reach >= 0
                for jj in range(g - b):
                    sel = dly == (g - b - 1 - jj)
                    rr = jnp.where(sel, xnew_ref[0, jj, 0].astype(odt),
                                   rr)
                    ri = jnp.where(sel, xnew_ref[0, jj, 1].astype(odt),
                                   ri)
            accs[g][0] += rr * hr - ri * hi
            accs[g][1] += rr * hi + ri * hr
    for g in range(n_grp):
        outs[g][0, 0] = accs[g][0]
        outs[g][0, 1] = accs[g][1]


def _group_unfused_rc(R: int) -> int:
    """Bin-tile for the unfused group kernel. Full row is the measured
    default: at the 256ch scale shape G=4 runs 1.3511 ms/block full-row
    vs 1.4194 with Rc=8 (the per-(f,r) block switching costs more than
    the larger live accumulators save). Env-tunable for hardware A/B;
    Mosaic wants Rc % 8 == 0 or Rc == R."""
    env = int(os.environ.get("BRUTEFIR_TPU_GROUPTILE_RC", "0"))
    if env > 0 and R % env == 0 and (env % 8 == 0 or env == R):
        return env
    return R


def _group_unfused_vmem(G: int, B: int, R: int) -> int:
    """VMEM bytes at grid (F, R/Rc): double-buffered ring + bank rows +
    xnew row + G output blocks, in [2, Rc, 128] f32 units."""
    rc = _group_unfused_rc(R)
    return (4 * B + 2 * (G - 1) + 2 * G) * 2 * rc * 128 * 4


def group_unfused_fusable(G: int, B: int, K: int) -> bool:
    """Can the unfused grouped MAC run at this shape (VMEM budget)?"""
    if K % 128 != 0 or G < 2:
        return False
    return _group_unfused_vmem(G, B, K // 128) <= 12 * 2**20


def _group_unfused_call(ring5, xnew6, bank5, coeff_idx, rposg, dly,
                        maskf, interpret):
    F, B, _, R, _ = ring5.shape
    G = xnew6.shape[1] + 1
    Rc = _group_unfused_rc(R)
    odt = _odt(ring5.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(F, R // Rc),
        in_specs=[
            pl.BlockSpec((1, B, 2, Rc, 128),
                         lambda f, r, idx, rp, dl, mk: (f, 0, 0, r, 0)),
            pl.BlockSpec((1, G - 1, 2, Rc, 128),
                         lambda f, r, idx, rp, dl, mk: (f, 0, 0, r, 0)),
            pl.BlockSpec((1, B, 2, Rc, 128),
                         lambda f, r, idx, rp, dl, mk: (idx[f], 0, 0, r, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 2, Rc, 128),
                                lambda f, r, idx, rp, dl, mk: (f, 0, r, 0))
                   ] * G,
    )
    return pl.pallas_call(
        functools.partial(_mac_kernel_rowmajor_group, n_part=B, n_grp=G),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((F, 2, R, 128), odt)] * G,
        interpret=interpret,
    )(coeff_idx.astype(jnp.int32), rposg, dly.astype(jnp.int32), maskf,
      ring5, xnew6, bank5)


def _group_bin0_rot(r0p, xn0, rposg, dly, g, G):
    """Block g's bin-0 ring row with the group's in-flight spectra
    substituted (the jnp mirror of the kernels' xnew select chain):
    partition b of block t+g reads write time t+g-b-dly, which is
    xnew[g-b-1-dly] when that index is >= 0. Shared by the fused and
    unfused group wrappers so their bin-0 semantics cannot diverge."""
    F = r0p.shape[0]
    farange = jnp.arange(F)
    rot = jnp.take(r0p, rposg[g], axis=1)                  # [F, B, 2]
    for b in range(g):
        j = g - b - 1 - dly                                # [F]
        xsel = xn0[farange, jnp.clip(j, 0, G - 2)]         # [F, 2]
        rot = rot.at[:, b, :].set(
            jnp.where((j >= 0)[:, None], xsel, rot[:, b, :]))
    return rot


def pallas_spectral_mac_group(ring, xnews, bank, coeff_idx, mask, t,
                              delay, interpret: bool = False):
    """Unfused grouped MAC for G consecutive blocks (t .. t+G-1).

    Same contract as pallas_spectral_mac_mix_group minus the output mix:
    returns a list of G per-filter spectra [F, 2, N] (bin-0 packed
    DC/Nyquist patched), for the caller to contract with the output mix
    (partconv.complex_mix). The group's schedule-difference slots are
    fed through ``xnews``/``delay`` exactly like the fused form."""
    if ring.ndim == 5:
        F, B, _, R, _ = ring.shape
        N = R * 128
        ring5 = ring
        bank5 = (bank if bank.ndim == 5
                 else bank.reshape(bank.shape[0], B, 2, R, 128))
        xnew6 = (xnews if xnews.ndim == 5
                 else jnp.moveaxis(xnews, 0, 1).reshape(
                     F, xnews.shape[0], 2, R, 128))
    else:
        F, B, _, N = ring.shape
        R = N // 128
        ring5 = ring.reshape(F, B, 2, R, 128)
        bank5 = bank.reshape(bank.shape[0], B, 2, R, 128)
        xnew6 = jnp.moveaxis(xnews, 0, 1).reshape(
            F, xnews.shape[0], 2, R, 128)
    G = xnew6.shape[1] + 1
    odt = _odt(ring.dtype)
    barange = jnp.arange(B, dtype=jnp.int32)
    rposg = jnp.stack([jnp.mod(t + g - barange, B).astype(jnp.int32)
                       for g in range(G)])                       # [G, B]
    maskf = mask.astype(odt)
    dly = delay.astype(jnp.int32)
    ys5 = _group_unfused_call(ring5, xnew6, bank5, coeff_idx, rposg, dly,
                              maskf, interpret)

    # bin-0 patches (packed DC/Nyquist -- independent real products),
    # same selection as the fused form but set per filter
    r0p = ring5[:, :, :, 0, 0]                                 # [F, B, 2]
    b0p = bank5[:, :, :, 0, 0]                                 # [E, B, 2]
    xn0 = xnew6[:, :, :, 0, 0]                                 # [F, G-1, 2]
    h0 = jnp.take(b0p, coeff_idx, axis=0) * mask[:, :, None]
    outs = []
    for g in range(G):
        rot = _group_bin0_rot(r0p, xn0, rposg, dly, g, G)
        ygr = jnp.sum(rot[:, :, 0] * h0[:, :, 0], axis=1)
        ygi = jnp.sum(rot[:, :, 1] * h0[:, :, 1], axis=1)
        y = ys5[g].reshape(F, 2, N)
        outs.append(y.at[:, 0, 0].set(ygr).at[:, 1, 0].set(ygi))
    return outs


def pallas_spectral_mac_group_shmap(mesh, ring, xnews, bank, coeff_idx,
                                    mask, t, delay,
                                    interpret: bool = False):
    """pallas_spectral_mac_group under an ('f','sp') mesh via shard_map.

    Filters and bins shard without collectives (the MAC is elementwise
    in both, like pallas_spectral_mac_shmap); the separate output mix's
    contraction over 'f' is where the partitioner inserts the psum,
    OUTSIDE this call. ``ring``/``xnews`` must be lane-tiled 5-d; the
    bin-0 packed DC/Nyquist patch applies on the first 'sp' shard only.
    Returns a list of G per-filter spectra [F, 2, N], P('f', None, 'sp').
    """
    from jax.sharding import PartitionSpec as P

    B = ring.shape[1]
    G = xnews.shape[1] + 1

    def local(ring_l, xnew_l, bank_l, idx_l, mask_l, t_l, dly_l):
        barange = jnp.arange(B, dtype=jnp.int32)
        rposg = jnp.stack([jnp.mod(t_l + g - barange, B).astype(jnp.int32)
                           for g in range(G)])
        odt = _odt(ring_l.dtype)
        dly = dly_l.astype(jnp.int32)
        ys5 = _group_unfused_call(ring_l, xnew_l, bank_l, idx_l, rposg,
                                  dly, mask_l.astype(odt), interpret)
        F_l, _, _, R_l, _ = ring_l.shape
        r0p = ring_l[:, :, :, 0, 0]
        b0p = bank_l[:, :, :, 0, 0]
        xn0 = xnew_l[:, :, :, 0, 0]
        h0 = jnp.take(b0p, idx_l, axis=0) * mask_l[:, :, None]
        is0 = jax.lax.axis_index("sp") == 0
        outs = []
        for g in range(G):
            rot = _group_bin0_rot(r0p, xn0, rposg, dly, g, G)
            ygr = jnp.sum(rot[:, :, 0] * h0[:, :, 0], axis=1)
            ygi = jnp.sum(rot[:, :, 1] * h0[:, :, 1], axis=1)
            y = ys5[g].reshape(F_l, 2, R_l * 128)
            y = y.at[:, 0, 0].set(jnp.where(is0, ygr, y[:, 0, 0]))
            y = y.at[:, 1, 0].set(jnp.where(is0, ygi, y[:, 1, 0]))
            outs.append(y)
        return tuple(outs)

    spec5 = P("f", None, None, "sp", None)
    return list(jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec5, spec5, P(None, None, None, "sp", None),
                  P("f"), P("f", None), P(), P("f")),
        out_specs=tuple([P("f", None, "sp")] * G),
        check_vma=False,
    )(ring, xnews, bank, coeff_idx.astype(jnp.int32), mask, t,
      delay.astype(jnp.int32)))


def pallas_spectral_mac_mix_group(ring, xnews, bank, coeff_idx, mask, t, w,
                                  delay, interpret: bool = False):
    """Fused MAC + output mix for G consecutive blocks (t .. t+G-1).

    ``ring``: the spectra ring AFTER block t's write, BEFORE any later
    block's. ``xnews``: blocks t+1..t+G-1's in-mixed spectra
    [G-1, F, 2, N] (or tiled [F, G-1, 2, N/128, 128]), already cast to
    the ring dtype by the caller so a bf16 ring reads the same rounded
    values the sequential writes would have stored. ``delay``: [F] i32
    per-filter pre-delay in blocks (selects which xnew -- if any -- each
    later block's low partitions read; see _mac_mix_kernel_tiled_group).

    Returns a list of G mixed output spectra [C_out, 2, N]. Identical
    terms and per-block accumulation order as G pallas_spectral_mac_mix
    calls; the bank and ring rows are streamed from HBM once per group.
    """
    if ring.ndim == 5:
        F, B, _, R, _ = ring.shape
        N = R * 128
        ring5 = ring
        bank5 = (bank if bank.ndim == 5
                 else bank.reshape(bank.shape[0], B, 2, R, 128))
        xnew6 = (xnews if xnews.ndim == 5
                 else jnp.moveaxis(xnews, 0, 1).reshape(
                     F, xnews.shape[0], 2, R, 128))
    else:
        F, B, _, N = ring.shape
        R = N // 128
        ring5 = ring.reshape(F, B, 2, R, 128)
        bank5 = bank.reshape(bank.shape[0], B, 2, R, 128)
        xnew6 = jnp.moveaxis(xnews, 0, 1).reshape(
            F, xnews.shape[0], 2, R, 128)
    G = xnew6.shape[1] + 1
    C_out = w.shape[0]
    odt = _odt(ring.dtype)
    barange = jnp.arange(B, dtype=jnp.int32)
    rposg = jnp.stack([jnp.mod(t + g - barange, B).astype(jnp.int32)
                       for g in range(G)])                       # [G, B]
    maskf = mask.astype(odt)
    dly = delay.astype(jnp.int32)
    outs5 = _tiled_mix_group_call(ring5, xnew6, bank5, coeff_idx, rposg,
                                  dly, maskf, w.astype(odt), interpret)

    # bin-0 patches (packed DC/Nyquist -- independent real products),
    # contracted through the mix like pallas_spectral_mac_mix
    wod = w.astype(odt)
    r0p = ring5[:, :, :, 0, 0]                                 # [F, B, 2]
    b0p = bank5[:, :, :, 0, 0]                                 # [E, B, 2]
    xn0 = xnew6[:, :, :, 0, 0]                                 # [F, G-1, 2]
    h0 = jnp.take(b0p, coeff_idx, axis=0) * mask[:, :, None]
    hp = jax.lax.Precision.HIGHEST
    outs = []
    for g in range(G):
        rot = _group_bin0_rot(r0p, xn0, rposg, dly, g, G)
        ygr = jnp.sum(rot[:, :, 0] * h0[:, :, 0], axis=1)
        ygi = jnp.sum(rot[:, :, 1] * h0[:, :, 1], axis=1)
        out = outs5[g].reshape(C_out, 2, N)
        out = (out.at[:, 0, 0].set(jnp.einsum("cf,f->c", wod, ygr,
                                              precision=hp))
                  .at[:, 1, 0].set(jnp.einsum("cf,f->c", wod, ygi,
                                              precision=hp)))
        outs.append(out)
    return outs


def pallas_spectral_mac_mix_pair(ring, xnew, bank, coeff_idx, mask, t, w,
                                 usenew, interpret: bool = False,
                                 delay=None):
    """The G=2 group (kept as the original pair API; ``usenew`` is
    accepted for compatibility but the group kernel derives the xnew
    selection from ``delay`` -- pass it when filters have pre-delays).

    The ``usenew`` -> stand-in-delay shim below is valid ONLY at G=2:
    in-group substitution needs delay == 0 and any delay >= 1 behaves
    identically there, so mapping every usenew==0 filter to delay=1 is
    exact. A G>2 extension must pass ``delay`` explicitly -- delays in
    [1, G-2] select different xnew rows and the shim would pick wrong
    ones."""
    if delay is None:
        # usenew nonzero <=> delay == 0; any positive stand-in keeps the
        # group kernel's j = -delay < 0 for the delayed filters (G=2
        # only -- see docstring)
        delay = jnp.where(usenew != 0, 0, 1).astype(jnp.int32)
    if xnew.ndim == 4:   # tiled [F, 2, R, 128] -> [F, 1, 2, R, 128]
        F, _, R, _ = xnew.shape
        xnews = xnew.reshape(F, 1, 2, R, 128)
    else:                # flat [F, 2, N] -> [1, F, 2, N]
        xnews = xnew[None]
    out0, out1 = pallas_spectral_mac_mix_group(
        ring, xnews, bank, coeff_idx, mask, t, w, delay,
        interpret=interpret)
    return out0, out1


def pallas_spectral_mac_mix(ring, bank, coeff_idx, mask, t, w,
                            uniform: bool = False,
                            interpret: bool = False,
                            patch_bin0: bool = True):
    """Fused MAC + output mix: out[c] = sum_f w[c, f] * Y[f].

    Returns the mixed output spectra [C_out, 2, N] directly -- the
    per-filter Y of pallas_spectral_mac never hits HBM (~2x [F, 2, N] of
    traffic saved per block; VERDICT r2 item 4). ``w``: the real output
    mixing matrix [C_out, F] (ctrl.out_mix). Bin 0 (packed DC/Nyquist)
    is patched with a tiny dense contraction, like the unfused kernels.
    """
    if ring.ndim == 5:
        F, B, _, R, _ = ring.shape
        N = R * 128
        ring5 = ring
        bank5 = (bank if bank.ndim == 5
                 else bank.reshape(bank.shape[0], B, 2, R, 128))
    else:
        F, B, _, N = ring.shape
        R = N // 128
        ring5 = ring.reshape(F, B, 2, R, 128)
        bank5 = bank.reshape(bank.shape[0], B, 2, R, 128)
    C_out = w.shape[0]
    rpos = jnp.mod(t - jnp.arange(B, dtype=jnp.int32), B).astype(jnp.int32)
    maskf = mask.astype(_odt(ring.dtype))
    wf = jnp.transpose(w).astype(_odt(ring.dtype))          # [F, C_out] (SMEM)

    # big-shape route: when the [C_out, 2, R, 128] output block cannot
    # stay VMEM-resident next to the ring/bank rows (256 outputs x 8k
    # bins = 16.8 MB vs ~16 MB/core), bin-tile the output and run the
    # mix contraction on the MXU (_mac_mix_kernel_tiled). The uniform
    # case routes here too: its constant coeff index makes consecutive
    # bank blocks identical, which Mosaic fetches once per tile.
    out_bytes = C_out * 2 * R * 128 * 4
    row_bytes = B * 2 * R * 128 * 4
    if out_bytes + 4 * row_bytes > 12 * 2**20:
        out5 = _tiled_mix_call(ring5, bank5, coeff_idx, rpos, maskf,
                               w.astype(_odt(ring.dtype)), interpret)
        out = out5.reshape(C_out, 2, N)
        y0r, y0i = _bin0(ring, bank, coeff_idx, mask, rpos)
        o0r = jnp.einsum("cf,f->c", w.astype(_odt(ring.dtype)), y0r,
                         precision=jax.lax.Precision.HIGHEST)
        o0i = jnp.einsum("cf,f->c", w.astype(_odt(ring.dtype)), y0i,
                         precision=jax.lax.Precision.HIGHEST)
        if patch_bin0:
            return out.at[:, 0, 0].set(o0r).at[:, 1, 0].set(o0i)
        return out, o0r, o0i

    if uniform:
        bank_row = bank5[coeff_idx[0]]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(F,),
            in_specs=[
                pl.BlockSpec((1, B, 2, R, 128),
                             lambda f, rp, mk, wr: (f, 0, 0, 0, 0)),
                pl.BlockSpec((B, 2, R, 128),
                             lambda f, rp, mk, wr: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((C_out, 2, R, 128),
                                   lambda f, rp, mk, wr: (0, 0, 0, 0)),
        )
        out5 = pl.pallas_call(
            functools.partial(_mac_mix_kernel_uniform, n_part=B,
                              n_out=C_out),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((C_out, 2, R, 128), _odt(ring.dtype)),
            interpret=interpret,
        )(rpos, maskf[0], wf, ring5, bank_row)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(F,),
            in_specs=[
                pl.BlockSpec((1, B, 2, R, 128),
                             lambda f, idx, rp, mk, wr: (f, 0, 0, 0, 0)),
                pl.BlockSpec((1, B, 2, R, 128),
                             lambda f, idx, rp, mk, wr: (idx[f], 0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((C_out, 2, R, 128),
                                   lambda f, idx, rp, mk, wr: (0, 0, 0, 0)),
        )
        out5 = pl.pallas_call(
            functools.partial(_mac_mix_kernel_rowmajor, n_part=B,
                              n_out=C_out),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((C_out, 2, R, 128), _odt(ring.dtype)),
            interpret=interpret,
        )(coeff_idx.astype(jnp.int32), rpos, maskf, wf, ring5, bank5)

    out = out5.reshape(C_out, 2, N)
    # bin-0 patch, contracted through the mix (DC and Nyquist are
    # independent real products; see _bin0)
    y0r, y0i = _bin0(ring, bank, coeff_idx, mask, rpos)
    o0r = jnp.einsum("cf,f->c", w.astype(_odt(ring.dtype)), y0r,
                     precision=jax.lax.Precision.HIGHEST)
    o0i = jnp.einsum("cf,f->c", w.astype(_odt(ring.dtype)), y0i,
                     precision=jax.lax.Precision.HIGHEST)
    if patch_bin0:
        return out.at[:, 0, 0].set(o0r).at[:, 1, 0].set(o0i)
    return out, o0r, o0i


def pallas_spectral_mac_mix_shmap(mesh, ring, bank, coeff_idx, mask, t, w,
                                  uniform: bool = False,
                                  interpret: bool = False) -> jax.Array:
    """Fused MAC+mix under an ('f','sp') mesh.

    Each device runs the fused kernel on its local [F/f, ..., K/sp] ring
    shard against its bank bin-shard and its w column slice, producing a
    PARTIAL [C_out, 2, K/sp] sum; one psum over 'f' completes the output
    mix -- the same reduce the partitioner inserts for the unfused
    complex_mix, but with Y never materialized. The bin-0 (packed
    DC/Nyquist) patch applies only on the first 'sp' shard, whose local
    bin 0 is the global one.
    """
    from jax.sharding import PartitionSpec as P

    B = ring.shape[1]

    def local(ring_l, bank_l, idx_l, mask_l, t_l, w_l):
        out, o0r, o0i = pallas_spectral_mac_mix(
            ring_l, bank_l, idx_l, mask_l, t_l, w_l,
            uniform=uniform, interpret=interpret, patch_bin0=False)
        is0 = jax.lax.axis_index("sp") == 0
        out = out.at[:, 0, 0].set(
            jnp.where(is0, o0r, out[:, 0, 0]))
        out = out.at[:, 1, 0].set(
            jnp.where(is0, o0i, out[:, 1, 0]))
        return jax.lax.psum(out, "f")

    if ring.ndim == 5:
        ring_spec = P("f", None, None, "sp", None)
        bank_spec = P(None, None, None, "sp", None)
    else:
        ring_spec = P("f", None, None, "sp")
        bank_spec = P(None, None, None, "sp")
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(ring_spec, bank_spec, P("f"), P("f", None), P(),
                  P(None, "f")),
        out_specs=P(None, None, "sp"),
        check_vma=False,
    )(ring, bank, coeff_idx.astype(jnp.int32), mask, t, w)


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

    if ring.ndim == 5:
        # tiled layout: 'sp' shards the tile-row axis R (same bins, same
        # granularity — contiguous 128-bin groups)
        ring_spec = P("f", None, None, "sp", None)
        bank_spec = P(None, None, None, "sp", None)
    else:
        ring_spec = P("f", None, None, "sp")
        bank_spec = P(None, None, None, "sp")
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(ring_spec, bank_spec, P("f"), P("f", None), P()),
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
