"""The CFHD format contract, expressed as data + tiny pure functions.

Everything here is derived from the published CineForm bitstream/algorithm
behavior (citations into the reference tree accompany each item). No device
code lives here; `ref/` and `ops/` both build on this single source of truth.
"""

from cineform_tpu.spec.wavelet import (  # noqa: F401
    ROUNDING,
    FILTER_SHIFT,
    H26_BORDER_FIRST,
    H26_BORDER_LAST,
)
from cineform_tpu.spec.quant import (  # noqa: F401
    build_companding_tables,
    demo_quant_tables,
    quant_midpoint,
    quant_multiplier,
)
