"""Device-side I/O path: the whole block program including sample codecs.

When every device format is word-addressable, no dither is configured and
no delay lines are in play (see ops/device_codec.py), the engine swaps its
host codec for this wrapper: one jitted function takes the raw input words
of every input device and returns the raw output words of every output
device plus per-channel meters. Host work per block collapses to file
reads/writes and transfers shrink to wire format width.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..config.model import BFConfig, IN, OUT
from ..graph.compile import _step_impl
from ..ops.device_codec import device_format_word, decode_words, encode_words
from ..ops.device_dither import dither_window, dither_quantize


def _wire3(fmt) -> bool:
    """3-byte packed S24: the file bytes are the wire format verbatim
    (sign-extended on device) -- bit-exact, so always device-eligible."""
    return (not fmt.is_float and fmt.bytes == 3 and fmt.sbytes == 3
            and fmt.little_endian and np.little_endian)


def eligible(conf: BFConfig) -> bool:
    for io in (IN, OUT):
        for dev in conf.iodevs[io]:
            if (device_format_word(dev.sample_format) is None
                    and not _wire3(dev.sample_format)):
                return False
        if any(d != 0 for d in conf.delay[io]):
            return False
        if any(md >= 0 for md in conf.maxdelay[io]):
            return False  # runtime-changeable delays need host delay lines
    if conf.use_subdelay[IN] or conf.use_subdelay[OUT]:
        return False
    return True


class DeviceIO:
    def __init__(self, engine):
        conf = engine.conf
        self.conf = conf
        self.N = engine.N
        self.rd = engine.rd
        spec = engine.spec
        mac = engine.cg.mac
        tiled = engine.cg.tiled

        self.in_words = [device_format_word(d.sample_format)
                         for d in conf.iodevs[IN]]
        self.out_words = [device_format_word(d.sample_format)
                          for d in conf.iodevs[OUT]]

        # Wire compaction: S24-in-4-byte inputs ship only the 3
        # significant bytes and are sign-extended on device -- 25% less
        # host->device traffic, which is the end-to-end bottleneck (the
        # block's audio payload). Exact for in-range data; inputs whose
        # padding byte is not the sign extension (out-of-spec S24) decode
        # differently from the reference's raw int32 read
        # (raw2real.h:143-153) -- see docs/PARITY.md. Kill switch:
        # BRUTEFIR_TPU_WIRE_PACK24=0.
        pack24 = os.environ.get("BRUTEFIR_TPU_WIRE_PACK24", "1") != "0"

        def _p24(fmt):
            return (pack24 and not fmt.is_float and fmt.bytes == 4
                    and fmt.sbytes == 3 and fmt.little_endian
                    and np.little_endian)

        self.in_wire = []       # per input device: "word" | "p24" | "raw3"
        self.in_wire_dtype = []
        self.in_wire_shape = []  # per-frame trailing shape
        for di, dev in enumerate(conf.iodevs[IN]):
            fmt = dev.sample_format
            if _wire3(fmt) or _p24(fmt):
                self.in_wire.append("raw3" if _wire3(fmt) else "p24")
                self.in_words[di] = np.dtype(np.int32)  # decoded word type
                self.in_wire_dtype.append(np.dtype(np.uint8))
                self.in_wire_shape.append((dev.open_channels, 3))
            else:
                self.in_wire.append("word")
                self.in_wire_dtype.append(self.in_words[di])
                self.in_wire_shape.append((dev.open_channels,))
        # symmetric packing on the way out (device->host)
        self.out_wire = []
        for di, dev in enumerate(conf.iodevs[OUT]):
            fmt = dev.sample_format
            if _wire3(fmt):
                self.out_wire.append("raw3")
                self.out_words[di] = np.dtype(np.int32)  # encode word type
            elif _p24(fmt):
                self.out_wire.append("p24")
            else:
                self.out_wire.append("word")

        # static per-device decode/encode wiring
        in_devs = []
        for dev in conf.iodevs[IN]:
            sel = np.asarray(dev.channel_selection, np.int32)
            vmap = np.asarray(dev.virt2phys_local, np.int32)
            in_devs.append((sel, vmap))
        out_devs = []
        for dev in conf.iodevs[OUT]:
            sel = np.asarray(dev.channel_selection, np.int32)
            # virtual rows summing into each used physical row
            rows = []
            for i in range(dev.used_channels):
                phys = dev.phys_base + i
                rows.append(np.asarray(conf.phys2virt[OUT][phys], np.int64))
            mix = np.zeros((dev.used_channels, conf.n_channels[OUT]),
                           engine.rd)
            for i, virts in enumerate(rows):
                mix[i, virts] = 1.0
            out_devs.append((sel, mix, dev.open_channels,
                             dev.sample_format))

        # --- device-resident dither (ops/device_dither.py) ---
        # same channel rule and table indexing as the host path
        # (engine.py dither_init analog): int formats with sbytes < 4 on
        # apply_dither devices, one shared Tausworthe table, channel j's
        # pointer starting at j * spacing + 1 in sorted-phys order.
        dith_phys = []
        self._dev_dither = []            # per out device: bool
        for dev in conf.iodevs[OUT]:
            fmt = dev.sample_format
            dithers = bool(dev.apply_dither and not fmt.is_float
                           and fmt.sbytes < 4)
            self._dev_dither.append(dithers)
            if dithers:
                for i in range(dev.used_channels):
                    dith_phys.append(dev.phys_base + i)
        self._dith_rows = []             # per out device: [used] -> D idx
        self.dstate = {}
        self._dith_tab = None
        if dith_phys:
            from ..core.dither import DitherTable
            order = {p: j for j, p in enumerate(sorted(dith_phys))}
            table = DitherTable(len(dith_phys), conf.sampling_rate,
                                conf.max_dither_table_size, self.N,
                                engine.rd.type)
            self._dith_tab = jnp.asarray(table.tab)
            self._dith_randmap = jnp.asarray(table.randmap)
            self._dith_size = table.size
            ptr0 = []
            for dev in conf.iodevs[OUT]:
                if not (dev.apply_dither and not dev.sample_format.is_float
                        and dev.sample_format.sbytes < 4):
                    self._dith_rows.append(None)
                    continue
                rows = np.asarray([order[dev.phys_base + i]
                                   for i in range(dev.used_channels)],
                                  np.int32)
                self._dith_rows.append(rows)
            D = len(dith_phys)
            ptr0 = np.asarray([j * table.spacing + 1 for j in range(D)],
                              np.int32)
            last0 = np.asarray([int(table.tab[p - 1]) for p in ptr0],
                               np.int32)
            self.dstate = {
                "ptr": jnp.asarray(ptr0),
                "last": jnp.asarray(last0),
                "sf": jnp.zeros((D, 2), engine.rd),
            }
        else:
            self._dith_rows = [None] * len(conf.iodevs[OUT])

        spec_ = spec
        in_wire = list(self.in_wire)
        out_wire = list(self.out_wire)

        dith_tab = self._dith_tab
        dith_rows = list(self._dith_rows)
        dev_dither = list(self._dev_dither)
        if dith_tab is not None:
            dith_randmap = self._dith_randmap
            dith_size = self._dith_size

        def full_step(state, ctrl, in_gain, out_gain, bank, in_words,
                      dstate, uniform=False):
            xs = []
            for di, (sel, vmap) in enumerate(in_devs):
                w = in_words[di]
                if in_wire[di] in ("p24", "raw3"):
                    # [N, open, 3] le bytes -> sign-extended int32 words
                    w = w.astype(jnp.int32)
                    w = w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16)
                    w = w - ((w & 0x800000) << 1)
                xs.append(decode_words(w, sel, vmap, spec_.real_dtype))
            x = jnp.concatenate(xs, axis=0) * in_gain[:, None]
            state, y = _step_impl(spec_, mac, state, ctrl, bank, x,
                                  uniform=uniform, tiled=tiled)
            nan_ok = jnp.all(jnp.isfinite(y[:, 0])) if y.shape[0] else jnp.bool_(True)
            y = y * out_gain[:, None]
            new_dstate = dstate
            if dith_tab is not None:
                # one shared window per block advances every dithered
                # channel's pointer by N (host-path parity)
                d_all, nptr, nlast = dither_window(
                    dith_tab, dith_randmap, dstate["ptr"], dstate["last"],
                    spec_.block_length, dith_size)
                sf_all = dstate["sf"]
            outs = []
            meters = []
            for di, ((sel, mixm, open_ch, fmt), wdt) in enumerate(
                    zip(out_devs, self.out_words)):
                # HIGHEST: the MXU's default f32 matmul is bf16-based,
                # far below 24-bit audio precision (see partconv)
                phys = jnp.matmul(mixm, y,
                                  precision=jax.lax.Precision.HIGHEST)
                peak = jnp.max(jnp.abs(phys), axis=1)
                if dev_dither[di]:
                    rows = dith_rows[di]
                    q, sf_new, m = dither_quantize(
                        phys, d_all[rows], sf_all[rows],
                        fmt.imin, fmt.imax)
                    sf_all = sf_all.at[rows].set(sf_new)
                    words = jnp.zeros((phys.shape[1], open_ch), wdt)
                    words = words.at[:, sel].set(q.astype(wdt).T)
                else:
                    words, m = encode_words(phys, fmt, sel, open_ch, wdt)
                if out_wire[di] in ("p24", "raw3"):
                    # [N, open] int32 -> [N, open, 3] le bytes on the wire
                    w32 = words.astype(jnp.int32)
                    words = jnp.stack(
                        [(w32 >> s) & 0xFF for s in (0, 8, 16)],
                        axis=-1).astype(jnp.uint8)
                outs.append(words)
                meters.append(jnp.concatenate([m, peak[:, None]], axis=1))
            if dith_tab is not None:
                new_dstate = {"ptr": nptr, "last": nlast, "sf": sf_all}
            return state, tuple(outs), tuple(meters), nan_ok, new_dstate

        self._full_step = full_step
        self._step = jax.jit(full_step, donate_argnums=(0,))
        # uniform-coefficient program variant (host-selected, see
        # graph/compile.py); identical except the uniform MAC
        if mac == "jnp" or mac.startswith("pallas"):
            self._step_u = jax.jit(
                functools.partial(full_step, uniform=True),
                donate_argnums=(0,))
        else:
            self._step_u = self._step
        self._multi = {}

    def step(self, state, ctrl, in_gain, out_gain, bank, in_words,
             uniform=False):
        fn = self._step_u if uniform else self._step
        state, outs, meters, nan_ok, self.dstate = fn(
            state, ctrl, in_gain, out_gain, bank, in_words, self.dstate)
        return state, outs, meters, nan_ok

    def multi_step(self, m: int, uniform: bool = False):
        """A scan over m blocks per dispatch (offline throughput mode).

        Controls are frozen across the m blocks; the host amortizes the
        dispatch/transfer round trip. Inputs are per-device stacked words
        [m, N, open_ch]; outputs stacked likewise, meters aggregated.
        """
        key = (m, uniform and self._step_u is not self._step)
        if key not in self._multi:
            fs = functools.partial(self._full_step, uniform=key[1])

            def multi(state, ctrl, in_gain, out_gain, bank, in_words,
                      dstate):
                def body(carry, words):
                    st, ds = carry
                    st, outs, meters, nan, ds = fs(st, ctrl, in_gain,
                                                   out_gain, bank,
                                                   list(words), ds)
                    return (st, ds), (outs, meters, nan)

                (state, dstate), (outs, meters, nans) = jax.lax.scan(
                    body, (state, dstate), tuple(in_words))
                agg = tuple(
                    jnp.concatenate([
                        jnp.sum(md[:, :, :1], axis=0),      # clip counts
                        jnp.max(md[:, :, 1:], axis=0),      # peaks
                    ], axis=1)
                    for md in meters)
                return state, outs, agg, jnp.all(nans), dstate

            jfn = jax.jit(multi, donate_argnums=(0,))

            def wrapped(state, ctrl, in_gain, out_gain, bank, in_words,
                        _fn=jfn):
                state, outs, agg, nan, self.dstate = _fn(
                    state, ctrl, in_gain, out_gain, bank, in_words,
                    self.dstate)
                return state, outs, agg, nan

            self._multi[key] = wrapped
        return self._multi[key]
