"""brutefir_tpu — a TPU-native multi-channel FIR convolution engine.

A ground-up rebuild of the capabilities of BruteFIR (the classic C
partitioned-convolution engine, reference layout at /root/reference) designed
for TPU hardware: the per-block signal path compiles to a single jitted XLA
program (rfft -> mixing matmuls -> partitioned spectral MAC -> irfft), runtime
controls are block-boundary-snapshotted device arguments, and the
fork/pipe/shared-memory pipeline of the reference becomes overlapped host I/O
and asynchronous device dispatch.

Public entry points:
    brutefir_tpu.config.parse_config_file  -- parse a BruteFIR config
    brutefir_tpu.runtime.Engine            -- run a parsed config
"""

__version__ = "0.1.0"
