from .time import epoch_us, epoch_ms, nearest_bucket
from .names import attr_full_name, attr_control_system, attr_without_cs

__all__ = [
    "epoch_us",
    "epoch_ms",
    "nearest_bucket",
    "attr_full_name",
    "attr_control_system",
    "attr_without_cs",
]
