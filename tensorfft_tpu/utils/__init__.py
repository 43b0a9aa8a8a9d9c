"""Device capability queries and roofline models."""

from tensorfft_tpu.utils.device import (
    KERNEL_VMEM_LIMIT_BYTES,
    DeviceSpec,
    OverlapEstimate,
    all_to_all_seconds,
    device_spec,
    fft_roofline_seconds,
    overlap_estimate,
)
