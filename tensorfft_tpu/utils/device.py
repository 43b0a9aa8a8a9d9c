"""Device capability queries.

Counterpart of the reference's device interrogation
(PlanWorksOnDevice/GetMaxNoOptInSharedMem, Plan.h:257-303, built on
cudaGetDeviceProperties): peak flops, HBM bandwidth, and VMEM budget per
platform, used by plan validation, the benchmark roofline, and the tuner.
Numbers are per-chip datasheet values; measured achievable fractions on this
project's rig are ~88% (MXU) / ~92% (HBM) — see testing/timer.chain_measure.
"""
from __future__ import annotations

import dataclasses

__all__ = [
    "DeviceSpec",
    "device_spec",
    "fft_roofline_seconds",
    "KERNEL_VMEM_LIMIT_BYTES",
]

# Scoped-VMEM limit every Pallas kernel in this library passes to
# pltpu.CompilerParams(vmem_limit_bytes=...), raising the 16 MiB compiler
# default.  plan_works_on_device budgets against this same constant (minus
# a table/double-buffer reserve) so planning and kernels can't drift apart.
KERNEL_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class DeviceSpec:
    platform: str
    kind: str
    bf16_flops: float          # peak bf16 FLOP/s (MXU)
    hbm_bandwidth: float       # bytes/s
    vmem_bytes: int            # scoped VMEM per core
    mxu_size: int = 128


# vmem_bytes is the usable per-kernel budget: the scoped limit the kernels
# actually request (KERNEL_VMEM_LIMIT_BYTES, not the 16 MiB compiler default)
# minus a reserve for stage tables and Mosaic double-buffering.  Measured on
# v5e: ~33 MiB data working sets compile and run under the 100 MiB limit.
_VMEM_BUDGET = KERNEL_VMEM_LIMIT_BYTES - 36 * 2**20
_KNOWN = {
    # kind-substring -> spec template
    "v5 lite": DeviceSpec("tpu", "v5e", 197e12, 819e9, _VMEM_BUDGET),
    "v5e": DeviceSpec("tpu", "v5e", 197e12, 819e9, _VMEM_BUDGET),
    "v5p": DeviceSpec("tpu", "v5p", 459e12, 2765e9, _VMEM_BUDGET),
    "v4": DeviceSpec("tpu", "v4", 275e12, 1228e9, _VMEM_BUDGET),
    "v6": DeviceSpec("tpu", "v6e", 918e12, 1640e9, _VMEM_BUDGET),
}

_CPU = DeviceSpec("cpu", "host", 1e12, 100e9, 128 * 2**20)


def device_spec(device=None) -> DeviceSpec:
    import jax

    if device is None:
        device = jax.devices()[0]
    platform = getattr(device, "platform", "cpu")
    if platform != "tpu":
        return dataclasses.replace(_CPU, platform=platform)
    kind = getattr(device, "device_kind", "").lower()
    for key, spec in _KNOWN.items():
        if key in kind:
            return spec
    return _KNOWN["v5e"]  # conservative default


def fft_roofline_seconds(
    n: int,
    batch: int,
    radices,
    itemsize: int,
    spec: DeviceSpec | None = None,
    passes: int = 1,
) -> float:
    """Speed-of-light wall time for a batched FFT on one chip.

    max(HBM bound, MXU bound): HBM = read+write both planes per pass; MXU =
    padded block-complex MACs (M and K of the 2R x 2R stage matmul pad to the
    MXU tile).
    """
    if spec is None:
        spec = device_spec()
    hbm_bytes = passes * 2 * 2 * n * batch * itemsize
    hbm_s = hbm_bytes / spec.hbm_bandwidth
    macs = sum(
        max(2 * r, spec.mxu_size) ** 2 * (n // r) * batch for r in radices
    )
    mxu_s = macs / (spec.bf16_flops / 2)
    return max(hbm_s, mxu_s)
