"""Per-channel integer-sample delay lines (host side).

Functional equivalent of the reference delay buffers (`delay.c:228-407`):
a FIFO of ``delay`` samples ahead of the stream, with runtime-variable
delay up to ``maxdelay``. Steady-state output is exactly ``x[n - delay]``
with zero initial fill; increasing the delay inserts zeros, decreasing it
drops the oldest samples (matching the reference's buffer-reset semantics
on change, `delay.c:283-317`).
"""

from __future__ import annotations

import numpy as np


class DelayLine:
    def __init__(self, delay: int, maxdelay: int, dtype=np.float32):
        # maxdelay < 0 means the delay is fixed at its initial value
        # (delay_allocate_buffer delay.c:351-362)
        if 0 <= maxdelay < delay:
            delay = maxdelay
        self.maxdelay = maxdelay
        self.delay = delay
        self.dtype = dtype
        self.buf = np.zeros(delay, dtype=dtype)

    def set_delay(self, newdelay: int) -> None:
        if newdelay == self.delay:
            return
        if self.maxdelay >= 0 and newdelay > self.maxdelay:
            return  # silently refused, like change_delay (delay.c:289-291)
        if self.maxdelay < 0:
            return  # not runtime-changeable
        if newdelay > self.delay:
            self.buf = np.concatenate(
                [np.zeros(newdelay - self.delay, self.dtype), self.buf])
        else:
            self.buf = self.buf[self.delay - newdelay:].copy()
        self.delay = newdelay

    def process(self, x: np.ndarray) -> np.ndarray:
        """Delay one block in place of the stream; returns the delayed block."""
        if self.delay == 0:
            return x
        joined = np.concatenate([self.buf, x])
        out = joined[: x.shape[0]]
        self.buf = joined[x.shape[0]:]
        return out
