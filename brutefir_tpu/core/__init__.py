from .sampleformat import SampleFormat, parse_sample_format, UnknownSampleFormat
from .codecs import Overflow, raw_to_float, float_to_raw, quantize_no_dither
from .dither import DitherTable, DitherState
