"""Device capability queries and roofline models."""

from tensorfft_tpu.utils.device import (
    DeviceSpec,
    device_spec,
    fft_roofline_seconds,
)
