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
    "OverlapEstimate",
    "all_to_all_seconds",
    "device_spec",
    "fft_roofline_seconds",
    "overlap_estimate",
    "KERNEL_VMEM_LIMIT_BYTES",
    "TABLE_HEADROOM_BYTES",
]

# Scoped-VMEM limit every Pallas kernel in this library passes to
# pltpu.CompilerParams(vmem_limit_bytes=...), raising the 16 MiB compiler
# default.  plan_works_on_device budgets against this same constant (minus
# a table/double-buffer reserve) so planning and kernels can't drift apart.
# 120 MiB (of the v5e's 128 MiB physical VMEM): measured round-4, the
# N=32768 single-pass fused kernel (16.8 MiB bf16 data working set) is
# REJECTED by the Mosaic allocator at a 100 MiB cap but compiles and runs
# at 120 MiB (548 us, beats the four-step incumbent) — tables, scratch and
# double-buffering inflate the true footprint ~3x over the data planes.
KERNEL_VMEM_LIMIT_BYTES = 120 * 1024 * 1024

# Headroom the TOTAL per-kernel footprint (data working set PLUS resident
# stage tables, ops/fused_pallas.stage_table_bytes) gets over the data-plane
# budget ``vmem_bytes``: total <= vmem_bytes + headroom.  Calibrated on v5e
# (64 MiB data budget) at the 120 MiB scoped cap, round-4 measurements: the
# committed N=16384 (64,256)+grouped headline kernel — 33.5 MiB f32 state
# planes + 33.5 MiB bf16 fold tables = 67 MiB — compiles and runs; its
# float32-policy twin (33.5 MiB state + 67 MiB f32 fold tables = 100.5 MiB)
# is rejected by the Mosaic allocator.  64 + 16 = 80 MiB sits between the
# measured pass and fail points.
TABLE_HEADROOM_BYTES = 16 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class DeviceSpec:
    platform: str
    kind: str
    bf16_flops: float          # peak bf16 FLOP/s (MXU)
    hbm_bandwidth: float       # bytes/s
    vmem_bytes: int            # scoped VMEM per core
    mxu_size: int = 128
    # Aggregate ICI egress per chip (all links, one direction), bytes/s.
    # Datasheet-derived: v5e 4 links x 45 GB/s (2D torus), v5p 6 x 90 (3D),
    # v4 6 x 45.  DCN (cross-slice) is ~25 GB/s per host NIC.
    ici_bandwidth: float = 180e9
    dcn_bandwidth: float = 25e9


# vmem_bytes is the usable per-kernel budget: the scoped limit the kernels
# actually request (KERNEL_VMEM_LIMIT_BYTES, not the 16 MiB compiler default)
# minus a reserve for stage tables and Mosaic double-buffering.  The reserve
# is calibrated to the round-4 mid-N measurements at the 120 MiB cap: the
# 33.5 MiB N=32768 fused working set compiles and runs; the 67 MiB N=65536
# one is rejected by the allocator — so the budget sits at 64 MiB, between
# them (and identical to the budget every committed tuner winner passed).
_VMEM_BUDGET = KERNEL_VMEM_LIMIT_BYTES - 56 * 2**20
_KNOWN = {
    # kind-substring -> spec template
    "v5 lite": DeviceSpec("tpu", "v5e", 197e12, 819e9, _VMEM_BUDGET,
                          ici_bandwidth=180e9),
    "v5e": DeviceSpec("tpu", "v5e", 197e12, 819e9, _VMEM_BUDGET,
                      ici_bandwidth=180e9),
    "v5p": DeviceSpec("tpu", "v5p", 459e12, 2765e9, _VMEM_BUDGET,
                      ici_bandwidth=540e9),
    "v4": DeviceSpec("tpu", "v4", 275e12, 1228e9, _VMEM_BUDGET,
                     ici_bandwidth=270e9),
    "v6": DeviceSpec("tpu", "v6e", 918e12, 1640e9, _VMEM_BUDGET,
                     ici_bandwidth=180e9),
}

_CPU = DeviceSpec("cpu", "host", 1e12, 100e9, 128 * 2**20,
                  ici_bandwidth=10e9)


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


@dataclasses.dataclass(frozen=True)
class OverlapEstimate:
    """Predicted timing of one pipelined global-transpose + compute phase."""

    comm_seconds: float        # full all_to_all wall time, no overlap
    compute_seconds: float     # full per-pencil compute time, no overlap
    serial_seconds: float      # comm + compute, overlap=1
    overlapped_seconds: float  # with the recommended chunk count
    chunks: int                # recommended overlap chunk count (1 = off)

    @property
    def speedup(self) -> float:
        return self.serial_seconds / self.overlapped_seconds


def all_to_all_seconds(
    local_bytes: int, n_devices: int, spec: DeviceSpec | None = None,
    efficiency: float = 0.8,
) -> float:
    """ICI roofline for one all_to_all over ``n_devices`` chips.

    Each chip sends (P-1)/P of its local shard out over its aggregate ICI
    egress; ``efficiency`` derates for link-level protocol overhead and the
    torus routing factor (ring/torus all_to_all achieves ~80% of aggregate
    egress for the mesh sizes of interest).
    """
    if spec is None:
        spec = device_spec()
    if n_devices <= 1:
        return 0.0
    out_bytes = local_bytes * (n_devices - 1) / n_devices
    return out_bytes / (spec.ici_bandwidth * efficiency)


def overlap_estimate(
    local_bytes: int,
    n_devices: int,
    compute_seconds: float,
    max_chunks: int = 8,
    spec: DeviceSpec | None = None,
    efficiency: float = 0.8,
) -> OverlapEstimate:
    """Predict whether software-pipelining a global transpose pays off.

    Models the parallel.pencil ``overlap=`` schedule: the shard is cut into
    ``c`` chunks; chunk i's all_to_all runs while chunk i-1 computes, so

        t(c) = (t_comm + t_compute) / c  +  (c-1)/c * max(t_comm, t_compute)
             ~ max + min/c   (for c chunks, perfect skew)

    minus nothing — each chunk also pays a per-collective latency floor
    (~5 us on ICI), which caps useful chunk counts.  Returns the best c in
    1..max_chunks (powers of two) under this model.

    BASELINE config 5 prediction (512^3 complex-f32 pencil 3D on v5p-16,
    documented per round-1 verdict #10): local shard 512^3/16 * 8 B = 67 MB,
    per-transpose comm ~ 145 us (540 GB/s * 0.8, 15/16 egress fraction),
    per-pencil compute ~ 130 us (2.7e9 FLOP per chip-pass at derated MXU
    throughput) -> comm and compute are nearly balanced; the model
    recommends overlap=4 and predicts ~1.45x per transpose phase (the
    2-stage fill bound hi + lo/c plus 5 us/chunk collective latency), i.e.
    ~1.35x end to end across the two transposes of the 2D-mesh pencil path.
    """
    if spec is None:
        spec = device_spec()
    latency_floor = 5e-6
    t_comm = all_to_all_seconds(local_bytes, n_devices, spec,
                                efficiency=efficiency)
    serial = t_comm + compute_seconds
    best_c, best_t = 1, serial
    c = 2
    while c <= max_chunks:
        # 2-stage pipeline bound: the dominant side runs back-to-back while
        # the other side hides behind it except for one exposed fill chunk.
        hi = max(t_comm, compute_seconds)
        lo = min(t_comm, compute_seconds)
        t = hi + lo / c + c * latency_floor
        if t < best_t:
            best_c, best_t = c, t
        c *= 2
    return OverlapEstimate(
        comm_seconds=t_comm,
        compute_seconds=compute_seconds,
        serial_seconds=serial,
        overlapped_seconds=best_t,
        chunks=best_c,
    )


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
