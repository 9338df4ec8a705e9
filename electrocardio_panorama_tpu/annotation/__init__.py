from electrocardio_panorama_tpu.annotation.auto_segment import auto_segment, detect_r_peaks
from electrocardio_panorama_tpu.annotation.schema import (
    BREAKPOINT_KEYS,
    beats_in,
    load_breakpoints,
    read_ecg_txt,
    save_breakpoints,
    validate_breakpoints,
)

__all__ = [
    "BREAKPOINT_KEYS",
    "read_ecg_txt",
    "load_breakpoints",
    "save_breakpoints",
    "validate_breakpoints",
    "beats_in",
    "auto_segment",
    "detect_r_peaks",
]
