"""Native (C++) host-runtime components, loaded via ctypes.

Currently: the per-song tokenizer hot loop (run-length event encoding with
tie-state indexing), ~50x the Python implementation. The library builds on
first use with `make` (g++); everything degrades gracefully to the Python
paths when no compiler is available.
"""

from mr_mt3_tpu.native.tokenizer import (
    encode_and_index_events_native,
    native_available,
)
