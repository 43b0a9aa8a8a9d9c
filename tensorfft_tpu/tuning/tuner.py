"""Autotuner: enumerate plan configurations, measure, keep the fastest.

Mirror of the reference's tuner machinery: GetSearchSpace enumerates warp
counts by powers of two within device limits (BenchUtil.h:77-107),
GetRunConfigs takes the cartesian product (:109-150), RunBenchOverSearchSpace
maps configs to measurements (Bench.h:22-69), GetFastestConfig is the argmin
(BenchUtil.h:60-75), and TunerSingleFFT.cu:10-56 drives the sweep and persists
results.  The TPU tunables are radix factorizations and four-step splits
instead of launch geometry; measurement uses the chained-slope timer.
"""
from __future__ import annotations

import dataclasses
import hashlib
import itertools
import json
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

from tensorfft_tpu.plan import (
    DEFAULT_MAX_FUSED_LENGTH,
    Precision,
    balanced_radices,
    create_plan,
    default_four_step_split,
    exact_log2,
    optimal_radices,
)

__all__ = [
    "RunConfig",
    "chain_step_for_plan",
    "get_search_space",
    "get_run_configs",
    "run_bench_over_search_space",
    "tune",
]


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """One candidate configuration (reference RunConfig, BenchUtil.h:24-30)."""

    radices: Optional[Tuple[int, ...]] = None
    four_step_split: Optional[Tuple[int, int]] = None
    strategy: str = "auto"
    lane_tile: int = 128
    grouped: bool = False
    state_dtype: str = "float32"
    col_radices: Optional[Tuple[int, ...]] = None
    row_radices: Optional[Tuple[int, ...]] = None
    complex_mult: str = "block"
    kloop_width: int = 128
    engine: str = "stacked"
    max_fused_length: Optional[int] = None
    k1_tile: int = 128
    interleave_downcast: bool = False

    def as_tuning(self) -> dict:
        t = {"strategy": self.strategy, "lane_tile": self.lane_tile}
        if self.radices is not None:
            t["radices"] = self.radices
        if self.four_step_split is not None:
            t["four_step_split"] = self.four_step_split
        if self.grouped:
            t["grouped"] = True
        if self.state_dtype != "float32":
            t["state_dtype"] = self.state_dtype
        if self.col_radices is not None:
            t["col_radices"] = self.col_radices
        if self.row_radices is not None:
            t["row_radices"] = self.row_radices
        if self.complex_mult != "block":
            t["complex_mult"] = self.complex_mult
        if self.kloop_width != 128:
            t["kloop_width"] = self.kloop_width
        if self.engine != "stacked":
            t["engine"] = self.engine
        if self.max_fused_length is not None:
            t["max_fused_length"] = self.max_fused_length
        if self.k1_tile != 128:
            t["k1_tile"] = self.k1_tile
        if self.interleave_downcast:
            t["interleave_downcast"] = True
        return t


def _cfg_key(cfg: "RunConfig") -> str:
    """Stable identity of a candidate for the resume log."""
    t = cfg.as_tuning()
    return json.dumps({k: (list(v) if isinstance(v, tuple) else v)
                       for k, v in t.items()}, sort_keys=True)


class ResumeLog:
    """Append-only measurement journal making a tuner sweep restartable.

    The tunnel to the TPU wedges every 30-60 min under sustained load
    (round-3 operational reality: seven consecutive 16384 full-sweep attempts
    died mid-run).  Persisting each measurement as one JSONL row means a
    killed/retried sweep replays completed configs from disk and only
    measures what is missing — a wedge costs one data point, not 40 minutes.

    Rows are keyed by the candidate's full tuning dict; head-to-heads by the
    pair of tuning dicts.  The log is stamped with the repo HEAD so stale
    journals from older kernel code never poison a retune.
    """

    def __init__(self, path):
        self.path = str(path)
        self._rows = {}
        self._attempts = {}
        stamp = _code_stamp()
        if os.path.exists(self.path):
            keep = []
            try:
                with open(self.path) as f:
                    for line in f:
                        row = json.loads(line)
                        if row.get("kind") == "meta":
                            if row.get("stamp") != stamp:
                                keep = None
                                break
                            continue
                        keep.append(row)
            except (OSError, json.JSONDecodeError):
                keep = None
            if keep is None:
                os.unlink(self.path)
            else:
                for row in keep:
                    if row.get("kind") == "attempt":
                        self._attempts[row["key"]] = (
                            self._attempts.get(row["key"], 0) + 1)
                    else:
                        self._rows[row["key"]] = row
        if not os.path.exists(self.path):
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "w") as f:
                f.write(json.dumps({"kind": "meta", "stamp": stamp}) + "\n")

    def get(self, key: str):
        return self._rows.get(key)

    def put(self, key: str, **payload):
        row = {"kind": "row", "key": key, **payload}
        self._rows[key] = row
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")

    # --- poison detection -------------------------------------------------
    # A config whose compile STALLS (Mosaic hangs rather than raising — the
    # known lane_tile=256 / VMEM-overbudget failure mode) kills the process,
    # so no result row is ever journaled and every resumed attempt would
    # stall at the same config forever.  mark_attempt() journals intent
    # BEFORE measuring; dangling_attempts() counts prior attempts that never
    # produced a result.  Callers skip a config after 2 dangling attempts
    # (one dangling attempt could be an innocent tunnel wedge).

    def mark_attempt(self, key: str):
        self._attempts[key] = self._attempts.get(key, 0) + 1
        with open(self.path, "a") as f:
            f.write(json.dumps({"kind": "attempt", "key": key}) + "\n")

    def dangling_attempts(self, key: str) -> int:
        if key in self._rows:
            return 0
        return self._attempts.get(key, 0)

    def done(self):
        try:
            os.unlink(self.path)
        except OSError:
            pass


def _code_stamp() -> str:
    """Hash of the library package's source blobs (not HEAD).

    Journals must be discarded when the measured code changes, but doc/test/
    benchmark commits landing mid-campaign should NOT poison an in-flight
    sweep's journal — only commits that touch ``tensorfft_tpu/`` can change
    what a measurement means.  The tuner cache itself
    (``tuning/tuner_cache.json``) is DATA the campaign produces, so committing
    retuned winners mid-campaign must not invalidate the very journals that
    produced them — it is excluded from the hash.  Falls back to HEAD (old
    behavior) for checkouts where the tree lookup fails.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            ["git", "-C", here, "ls-tree", "--full-tree", "-r",
             "HEAD:tensorfft_tpu"],
            capture_output=True, text=True, timeout=10,
        ).stdout
        lines = [ln for ln in out.splitlines()
                 if not ln.endswith("tuning/tuner_cache.json")]
        if lines:
            return hashlib.sha256(
                "\n".join(sorted(lines)).encode()).hexdigest()
    except Exception:
        pass
    try:
        out = subprocess.run(
            ["git", "-C", here, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if out:
            return out
    except Exception:
        pass
    return "unknown"


def _radix_candidates(n: int, max_candidates: int = 6) -> List[Tuple[int, ...]]:
    """Distinct plausible factorizations: MAC-optimal, balanced, neighbors.

    Each factorization is tried ascending AND descending: descending puts
    the small radices in later (twiddled) stages where the grouped
    block-diagonal path can pack them.
    """
    cands = [optimal_radices(n), balanced_radices(n)]
    p = exact_log2(n)
    # Structured alternatives around the optimum.  The [8]-based variant
    # (radix-256 stages, 512x512 block matmuls) costs 25% more padded MACs
    # than radix-128 but HALVES the kloop slice count — relevant exactly
    # where the fused kernel runs furthest above its copy floor (N=16384:
    # 2.55x, exp_decompose_fused.py).
    for logs in ([6] * (p // 6) + ([p % 6] if p % 6 else []),
                 [7] * (p // 7) + ([p % 7] if p % 7 else []),
                 [8] * (p // 8) + ([p % 8] if p % 8 else [])):
        if logs and all(1 <= l <= 8 for l in logs):
            cands.append(tuple(sorted(1 << l for l in logs)))
    cands += [tuple(reversed(c)) for c in list(cands)]
    out, seen = [], set()
    for c in cands:
        if c and c not in seen:
            seen.add(c)
            out.append(c)
    return out[:max_candidates]


def get_search_space(n: int, max_fused_length: int = DEFAULT_MAX_FUSED_LENGTH) -> dict:
    """Tunable dimensions for one fft_length (BenchUtil.h:77-107 analog)."""
    # lane_tile 256 doubles the fused working set; past n=4096 that is the
    # VMEM scale where Mosaic compilation stalls (not raises -- a hang the
    # sweep's try/except cannot skip), so it is only searched for small n.
    lane_tiles = [128, 256] if n <= 4096 else [128]
    space = {"radices": _radix_candidates(n), "strategy": ["fused"],
             "four_step_split": [None], "lane_tile": lane_tiles}
    if n > max_fused_length:
        p = exact_log2(n)
        pf = exact_log2(max_fused_length)
        splits = []
        base = default_four_step_split(n, max_fused_length)
        splits.append(base)
        for shift in (1, 2):
            p1 = p // 2 - shift
            cand = (1 << p1, 1 << (p - p1))
            if 0 < p1 and p - p1 <= pf and cand not in splits:
                splits.append(cand)
        space = {
            "radices": [None],
            "strategy": ["four_step"],
            "four_step_split": splits,
            "lane_tile": [128],
        }
        # Single-pass fused challengers just past the default fused cap:
        # two HBM passes bound four-step at ~2 TFLOP/s on v5e (copy floor
        # 408 us per 16.7M-point pass), so the only way above that bound at
        # mid-N is one pass.  The fused working set at n=32768 is 2*n*128
        # lanes * 4 B = 33.5 MiB fp32 (16.8 bf16) — inside the 100 MiB
        # scoped-VMEM setting; 65536 needs bf16 state.  Kept out of the
        # cartesian product (strategy axis stays four_step) and appended as
        # explicit extra configs in get_run_configs.
        if n <= 4 * max_fused_length:
            # Prefer few stages and small last-stage slice counts: the fused
            # kernel's trace-time unroll and interleave both scale with
            # k = n / r_last, so (128, 256) at n=32768 (k=128, the 16384
            # winner's structure scaled up) must outrank (32, 32, 32)
            # (k=1024, kloop unroll explosion) — a plain [:3] cut it.
            fused_cands = sorted(
                _radix_candidates(n), key=lambda r: (len(r), n // r[-1])
            )[:3]
            # Big-first orders of the two-stage candidates: the round-4
            # mid-N probe measured (256, 128) at 548 us vs (128, 256) at
            # 599 at n=32768 — a small LAST radix wins even though it
            # doubles the final interleave's slice count, and the candidate
            # enumeration only emits the small-first order.
            for r in list(fused_cands):
                rev = tuple(reversed(r))
                if len(r) == 2 and r[0] != r[1] and rev not in fused_cands:
                    fused_cands.append(rev)
            space["fused_bign"] = {
                "radices": fused_cands,
                "max_fused_length": n,
                "state_dtypes": (["float32", "bfloat16"]
                                 if n <= 2 * max_fused_length
                                 else ["bfloat16"]),
            }
    return space


def _groupable(radices) -> bool:
    """Grouping changes stages past the first: radix <= 32 stages pack
    p = 128/(2R) slices per block-diagonal matmul; radix >= 64 stages fold
    the twiddle into per-slice constants (p = 1) — see ops.fused_pallas
    _stage_kinds."""
    return radices is not None and len(radices) > 1


def get_run_configs(space: dict) -> List[RunConfig]:
    """Cartesian product of the search space (BenchUtil.h:109-150 analog)."""
    configs = []
    for radices, strategy, split, lane_tile in itertools.product(
        space["radices"], space["strategy"], space["four_step_split"],
        space.get("lane_tile", [128]),
    ):
        configs.append(
            RunConfig(radices=radices, strategy=strategy,
                      four_step_split=split, lane_tile=lane_tile)
        )
        if _groupable(radices):
            configs.append(
                RunConfig(radices=radices, strategy=strategy,
                          four_step_split=split, lane_tile=lane_tile,
                          grouped=True)
            )
        if strategy == "four_step" and split is not None:
            # Per-pass descending radix orders (small radices in the twiddled
            # tail stages, where the grouped block-diagonal packing applies —
            # the same structure that won the fused small-N retune).
            asc1, asc2 = optimal_radices(split[0]), optimal_radices(split[1])
            desc1, desc2 = tuple(reversed(asc1)), tuple(reversed(asc2))
            if (desc1, desc2) != (asc1, asc2):
                configs.append(
                    RunConfig(strategy=strategy, four_step_split=split,
                              lane_tile=lane_tile,
                              col_radices=desc1, row_radices=desc2)
                )
                if _groupable(desc1) or _groupable(desc2):
                    configs.append(
                        RunConfig(strategy=strategy, four_step_split=split,
                                  lane_tile=lane_tile,
                                  col_radices=desc1, row_radices=desc2,
                                  grouped=True)
                    )
    bign = space.get("fused_bign")
    if bign:
        for radices in bign["radices"]:
            for sd in bign["state_dtypes"]:
                configs.append(
                    RunConfig(radices=radices, strategy="fused",
                              max_fused_length=bign["max_fused_length"],
                              state_dtype=sd)
                )
    return configs


def chain_step_for_plan(plan, forward: bool = True):
    """A layout-stationary chain step measuring ONE transform of ``plan``.

    Fused/staged steps are layout-stationary as-is (output physical layout =
    input layout), so one forward transform is the step and the divisor is 1.

    Four-step output is produced through (b, n2, n1)-tiled block writes while
    the input is consumed as (b, n1, n2): chaining forward-only forces XLA to
    re-tile the carry every iteration, inflating measurements ~50% (round-1
    finding: composed chain read 1095 us where the two passes cost 716 us).
    Instead the step composes forward with the INVERSE under the swapped
    split (n2, n1), whose first pass reads exactly the forward output's
    physical layout and whose output restores the input layout — zero
    relayouts, and the measured slope is 2 transforms, so the divisor is 2.

    Returns (step_fn, divisor).
    """
    from tensorfft_tpu.fft import _fft_split_jit
    from tensorfft_tpu.plan import Strategy

    if plan.resolve_strategy() is not Strategy.FOUR_STEP:
        return (lambda a, b: _fft_split_jit(a, b, plan, forward)), 1

    n1, n2 = plan.four_step_split
    inv_plan = create_plan(
        plan.fft_length,
        precision=plan.precision.value,
        strategy="four_step",
        lane_tile=plan.lane_tile,
        tuning={
            "four_step_split": (n2, n1),
            # Swapped split means swapped pass radices, so the inverse arm
            # exercises the same per-pass configurations as the forward.
            "col_radices": plan.row_radices,
            "row_radices": plan.col_radices,
            **({"grouped": True} if plan.grouped else {}),
            **({"state_dtype": plan.state_dtype}
               if plan.state_dtype != "float32" else {}),
            **({"complex_mult": plan.complex_mult}
               if plan.complex_mult != "block" else {}),
            **({"engine": plan.engine}
               if plan.engine != "stacked" else {}),
            **({"first_dot": plan.first_dot}
               if plan.first_dot != "default" else {}),
            **({"k1_tile": plan.k1_tile}
               if plan.k1_tile != 128 else {}),
        },
    )

    def step(a, b):
        fr, fi = _fft_split_jit(a, b, plan, forward)
        return _fft_split_jit(fr, fi, inv_plan, not forward)

    return step, 2


def run_bench_over_search_space(
    n: int,
    configs: Sequence[RunConfig],
    batch: int = 1024,
    precision: str = "bfloat16",
    measure_kwargs: Optional[dict] = None,
    resume: Optional[ResumeLog] = None,
):
    """Measure every config; returns a list of (config, time_ns, sigma_ns)
    tuples (Bench.h:22-69 analog; sigma feeds the TunerData dump).

    With ``resume``, configs already journaled are replayed from disk and
    fresh measurements are journaled as they land (wedge-survivable sweep).
    """
    import jax.numpy as jnp

    from tensorfft_tpu.testing.timer import chain_measure

    from tensorfft_tpu.plan import Precision

    rng = np.random.default_rng(0)
    storage = Precision(precision).storage_dtype
    re = jnp.asarray(rng.standard_normal((batch, n)), storage)
    im = jnp.asarray(rng.standard_normal((batch, n)), storage)
    from tensorfft_tpu.plan import plan_works_on_device

    results = []
    for cfg in configs:
        key = _cfg_key(cfg)
        if resume is not None:
            row = resume.get(key)
            if row is not None:
                results.append((cfg, row["t_ns"], row["s_ns"]))
                continue
            if resume.dangling_attempts(key) >= 2:
                # this config killed two prior attempts (Mosaic stall /
                # repeated wedge) — poison, never measure it again
                results.append((cfg, float("inf"), 0.0))
                resume.put(key, t_ns=None, s_ns=0.0, poisoned=True)
                continue
        try:
            # device pre-check (the reference skips PlanWorksOnDevice
            # failures): VMEM-overbudget fused configs STALL Mosaic rather
            # than raising, so they must never reach compilation.
            probe_plan = create_plan(n, precision=precision,
                                     tuning=cfg.as_tuning())
            ok, _why = plan_works_on_device(probe_plan)
            if not ok:
                raise ValueError(_why)
        except Exception:
            results.append((cfg, float("inf"), 0.0))
            if resume is not None:
                resume.put(key, t_ns=None, s_ns=0.0)
            continue
        if resume is not None:
            resume.mark_attempt(key)
        try:
            plan = create_plan(n, precision=precision, tuning=cfg.as_tuning())
            fn, divisor = chain_step_for_plan(plan)
            r = chain_measure(fn, (re, im), **(measure_kwargs or {}))
            t = r.average_time_ns / divisor
            # chain_measure reports NaN when every slope is non-positive
            # (noisy relay window); NaN never loses a min() comparison, so an
            # unmeasured config could otherwise be crowned.
            results.append((
                cfg,
                float("inf") if np.isnan(t) else t,
                r.std_deviation_ns / divisor,
            ))
        except Exception as e:  # config invalid on this device — skip, like
            # the reference skipping PlanWorksOnDevice failures
            results.append((cfg, float("inf"), 0.0))
        if resume is not None:
            _, t_done, s_done = results[-1]
            resume.put(key, t_ns=t_done if np.isfinite(t_done) else None,
                       s_ns=s_done)
    if resume is not None:
        # journaled infinities come back as None
        results = [(c, float("inf") if t is None else t, s)
                   for c, t, s in results]
    return results


def _config_from_entry(entry: dict) -> RunConfig:
    """RunConfig of a persisted cache entry (the incumbent)."""
    return RunConfig(
        radices=tuple(entry["radices"]) if entry.get("radices") else None,
        four_step_split=tuple(entry["four_step_split"])
        if entry.get("four_step_split") else None,
        strategy=entry.get("strategy", "auto"),
        lane_tile=int(entry.get("lane_tile", 128)),
        grouped=bool(entry.get("grouped", False)),
        state_dtype=str(entry.get("state_dtype", "float32")),
        col_radices=tuple(entry["col_radices"])
        if entry.get("col_radices") else None,
        row_radices=tuple(entry["row_radices"])
        if entry.get("row_radices") else None,
        complex_mult=str(entry.get("complex_mult", "block")),
        kloop_width=int(entry.get("kloop_width", 128)),
        engine=str(entry.get("engine", "stacked")),
        max_fused_length=(int(entry["max_fused_length"])
                          if entry.get("max_fused_length") else None),
        k1_tile=int(entry.get("k1_tile", 128)),
        interleave_downcast=bool(entry.get("interleave_downcast", False)),
    )


def _twin_head_to_head(n, best_cfg, best_ns, batch, precision, alt,
                       audit=None, resume=None, tag="h2h"):
    """Challenge the sweep winner with a single-knob twin via an interleaved
    chain_compare (decision-grade) instead of doubling the whole sweep.

    Used for state_dtype (bf16 state halves in-VMEM traffic at one extra
    rounding per stage) and complex_mult (mult3 cuts radix>=128 stage MACs
    25% at the cost of extra VPU combines).
    """
    import jax.numpy as jnp

    from tensorfft_tpu.plan import Precision
    from tensorfft_tpu.testing.timer import chain_compare

    key = f"{tag}:{_cfg_key(best_cfg)}|{_cfg_key(alt)}"
    if resume is not None and resume.dangling_attempts(key) >= 2:
        return best_cfg, best_ns  # this pairing stalls — keep the incumbent
    row = resume.get(key) if resume is not None else None
    if row is not None:
        t_a, t_b = row["t_a"], row["t_b"]
        t_a = float("nan") if t_a is None else t_a
        t_b = float("nan") if t_b is None else t_b
        if audit is not None:
            audit.append((best_cfg, t_a, row["s_a"], tag))
            audit.append((alt, t_b, row["s_b"], tag))
        if not np.isnan(t_b) and (np.isnan(t_a) or t_b < t_a):
            return alt, t_b
        if not np.isnan(t_a):
            return best_cfg, t_a
        return best_cfg, best_ns
    from tensorfft_tpu.plan import plan_works_on_device

    try:
        p_a = create_plan(n, precision=precision, tuning=best_cfg.as_tuning())
        p_b = create_plan(n, precision=precision, tuning=alt.as_tuning())
        ok, _why = plan_works_on_device(p_b)
        if not ok:  # challenger would stall Mosaic — keep the incumbent
            return best_cfg, best_ns
        ok_a, _why = plan_works_on_device(p_a)
        if not ok_a:
            # The "incumbent" itself is undeployable (an off-policy seed —
            # e.g. the bf16 grouped structure under the float32 policy whose
            # fold tables blow VMEM): never compile it; the deployable
            # challenger wins by default with its sweep time.
            return alt, best_ns
    except Exception:
        return best_cfg, best_ns
    rng = np.random.default_rng(0)
    storage = Precision(precision).storage_dtype
    re = jnp.asarray(rng.standard_normal((batch, n)), storage)
    im = jnp.asarray(rng.standard_normal((batch, n)), storage)
    if resume is not None:
        resume.mark_attempt(key)
    try:
        step_a, div_a = chain_step_for_plan(p_a)
        step_b, div_b = chain_step_for_plan(p_b)
        r_a, r_b = chain_compare(step_a, step_b, (re, im))
    except Exception:
        return best_cfg, best_ns
    t_a = r_a.average_time_ns / div_a
    t_b = r_b.average_time_ns / div_b
    if resume is not None:
        resume.put(key,
                   t_a=None if np.isnan(t_a) else t_a,
                   s_a=r_a.std_deviation_ns / div_a,
                   t_b=None if np.isnan(t_b) else t_b,
                   s_b=r_b.std_deviation_ns / div_b)
    if audit is not None:
        audit.append((best_cfg, t_a, r_a.std_deviation_ns / div_a, "h2h"))
        audit.append((alt, t_b, r_b.std_deviation_ns / div_b, "h2h"))
    if not np.isnan(t_b) and (np.isnan(t_a) or t_b < t_a):
        return alt, t_b
    if not np.isnan(t_a):
        return best_cfg, t_a
    return best_cfg, best_ns


def tune(
    n: int,
    batch: int = 1024,
    precision: str = "bfloat16",
    cache=None,
    measure_kwargs: Optional[dict] = None,
    dump_dir=None,
    challenge_only: bool = False,
    resume_path=None,
    extra_configs: Optional[List["RunConfig"]] = None,
    seed_precision: Optional[str] = None,
    dump_tag: str = "",
    skip_knob_challenges: bool = False,
) -> dict:
    """Tune one fft_length and (optionally) persist the winner to ``cache``.

    Returns the winning tuning dict (TunerSingleFFT.cu main-loop analog).
    The incumbent cache entry (if any) is re-measured in the same sweep, and
    a challenger only replaces it after winning a decision-grade interleaved
    head-to-head (chain_compare) — sequential sweeps drift tens of percent
    across a window, which otherwise crowns arbitrary configs.

    ``challenge_only=True`` skips the structural sweep and starts from the
    cached incumbent (which must exist), running only the single-knob twin
    head-to-heads (state_dtype / engine / complex_mult / kloop_width).  This
    is the cheap retune after a shared-engine change (e.g. a stage_loop
    optimization) shifts knob trade-offs without touching the radix/split
    structure.

    ``dump_dir`` writes the full per-config measurement table to
    ``tuner_data_<n>.dat`` there (the reference's TunerData_<N>.dat,
    FileWriter.h:227-248) so tuner decisions stay auditable — round-2
    verdict item 6.

    ``resume_path`` journals every measurement (ResumeLog) so a killed
    sweep restarts where it died — required discipline on this tunnel.

    ``extra_configs`` appends explicit structural challengers to whatever
    the mode would measure — the cheap way to put ONE targeted candidate
    (e.g. a single-pass fused plan at a four-step incumbent's length) in
    front of the decision machinery without paying a full sweep.

    ``skip_knob_challenges=True`` measures ONLY the sweep-phase configs
    (incumbent + ``extra_configs``) plus the final incumbent guard — the
    cheap way to decide explicit structural challengers whose knob twins
    were already settled by a committed challenge dump (round-4 S15: the
    full twin ladder re-measures ~6 settled head-to-heads per run on a
    tunnel where each compile costs minutes).

    ``seed_precision`` lets a policy without any cached entry start a
    ``challenge_only`` retune from ANOTHER policy's winner structure (the
    float32 bf16x3 policy seeds from the bfloat16 winner): the seed is just
    the first measured config, not a protected incumbent.
    """
    import jax

    resume = ResumeLog(resume_path) if resume_path else None
    incumbent_cfg = None
    if cache is not None:
        platform = jax.devices()[0].platform
        entry = cache.get(n, precision, platform, batch=batch)
        if entry:
            incumbent_cfg = _config_from_entry(entry)
        elif seed_precision is not None:
            seed = cache.get(n, seed_precision, platform, batch=batch)
            if seed:
                incumbent_cfg = _config_from_entry(seed)
    if (incumbent_cfg is not None and precision != "bfloat16"
            and incumbent_cfg.state_dtype == "bfloat16"):
        # Off-policy bf16 state (see the config sanitizer below) must also
        # leave the incumbent/seed, or the final incumbent-guard would
        # reinstate it.
        incumbent_cfg = dataclasses.replace(
            incumbent_cfg, state_dtype="float32")
    if challenge_only:
        if incumbent_cfg is None:
            raise ValueError(
                f"challenge_only retune of n={n} needs a cached incumbent")
        configs = [incumbent_cfg]
    else:
        space = get_search_space(n)
        configs = get_run_configs(space)
        if incumbent_cfg is not None and incumbent_cfg not in configs:
            configs.append(incumbent_cfg)
    for cfg in extra_configs or []:
        if cfg not in configs:
            configs.append(cfg)
    if precision != "bfloat16":
        # bf16 in-VMEM state under the split-compensation policies would
        # silently discard the compensation the policy exists for; the tuner
        # decides on speed alone, so never offer that twin off-policy.
        configs = list(dict.fromkeys(
            dataclasses.replace(c, state_dtype="float32")
            if c.state_dtype == "bfloat16" else c
            for c in configs
        ))
    results = run_bench_over_search_space(
        n, configs, batch=batch, precision=precision,
        measure_kwargs=measure_kwargs, resume=resume,
    )
    audit = [(cfg, t, s, "sweep") for cfg, t, s in results]
    best_cfg, best_ns, _ = min(results, key=lambda r: r[1])
    if not skip_knob_challenges and (
            precision == "bfloat16" or best_cfg.state_dtype != "float32"):
        best_cfg, best_ns = _twin_head_to_head(
            n, best_cfg, best_ns, batch, precision,
            dataclasses.replace(
                best_cfg,
                state_dtype="bfloat16" if best_cfg.state_dtype == "float32"
                else "float32",
            ),
            audit=audit, resume=resume,
        )
    # Alternative in-VMEM engines back both the fused kernel and the
    # four-step pass kernels: 'planar' (separate re/im planes, twiddle-
    # folded constants).  'pretwiddle' is not challenged: the stacked
    # engine's kloop now applies the stage twiddle as the same single
    # broadcast multiply in-stage (round-3 breakdown), so the epilogue
    # hoist has nothing left to save (measured tie at N=16384/b=4096).
    # Challenge the winner with each engine it is not already running.
    # 'gridslice' defers the last stage's K-way sublane interleave to
    # grid-blocked per-slice HBM stores — on the fused kernel and on the
    # four-step K2 row pass (whose inner n2-transform pays the same
    # interleave per block); only legal when the last stage emits whole
    # slices (fused_pallas.gridslice_layout).
    split = best_cfg.four_step_split
    if split is None and best_cfg.strategy in ("auto", "four_step"):
        try:
            split = create_plan(
                n, precision=precision, tuning=best_cfg.as_tuning()
            ).four_step_split
        except Exception:
            split = None
    from tensorfft_tpu.ops.fused_pallas import gridslice_layout

    engine_alts = [] if skip_knob_challenges else ["stacked", "planar"]
    gs_quals = []
    if best_cfg.strategy == "fused":
        s_tot = gridslice_layout(tuple(best_cfg.radices or
                                       optimal_radices(n)), best_cfg.grouped)
        if s_tot is not None:
            gs_quals.append(s_tot)
    elif split is not None:
        # Either four-step pass can run gridslice independently (the other
        # falls back to stacked), so qualifying ANY pass earns the
        # challenge.  Pass scratch blocks are (R_last, lanes)-tiled, hence
        # the sublane-multiple last-radix requirement.
        for rads in (best_cfg.col_radices or optimal_radices(split[0]),
                     best_cfg.row_radices or optimal_radices(split[1])):
            rads = tuple(rads)
            if rads[-1] >= 8:
                s_tot = gridslice_layout(rads, best_cfg.grouped)
                if s_tot is not None:
                    gs_quals.append(s_tot)
    if gs_quals and not skip_knob_challenges:
        engine_alts.append("gridslice")
        if any(q % 16 == 0 for q in gs_quals):
            # tile-aligned chunked stores (C-way per-step interleave
            # overlapped with the DMA pipeline) vs single-sublane blocks
            engine_alts.append("gridslice16")
    for eng in engine_alts:
        if eng == best_cfg.engine:
            continue
        best_cfg, best_ns = _twin_head_to_head(
            n, best_cfg, best_ns, batch, precision,
            dataclasses.replace(best_cfg, engine=eng),
            audit=audit, resume=resume,
        )
    # mult3 only changes radix >= 128 stages; challenge when one exists.
    stage_radices = []
    for rads in (best_cfg.radices,
                 best_cfg.col_radices
                 or (optimal_radices(best_cfg.four_step_split[0])
                     if best_cfg.four_step_split else None),
                 best_cfg.row_radices
                 or (optimal_radices(best_cfg.four_step_split[1])
                     if best_cfg.four_step_split else None)):
        stage_radices += list(rads or ())
    if not best_cfg.radices and not best_cfg.four_step_split:
        stage_radices += list(optimal_radices(n))
    if not skip_knob_challenges and any(r >= 128 for r in stage_radices):
        best_cfg, best_ns = _twin_head_to_head(
            n, best_cfg, best_ns, batch, precision,
            dataclasses.replace(
                best_cfg,
                complex_mult="mult3" if best_cfg.complex_mult == "block"
                else "block",
            ),
            audit=audit, resume=resume,
        )
    # kloop_width doubles how many twiddled slices pack into one stage
    # matmul (fewer MXU pipeline fills per kloop stage); only fused-path
    # kernels consume it.
    if not skip_knob_challenges and best_cfg.strategy == "fused":
        best_cfg, best_ns = _twin_head_to_head(
            n, best_cfg, best_ns, batch, precision,
            dataclasses.replace(
                best_cfg,
                kloop_width=256 if best_cfg.kloop_width == 128 else 128,
            ),
            audit=audit, resume=resume,
        )
    # interleave_downcast is NOT challenged: its only hardware measurement
    # lost decisively (2276 vs 1248 us at the N=16384 headline, round-3 S8 —
    # the cast adds a VPU pass rather than removing one), so the twin slot
    # is retired.  The plan field remains for explicit tuning dicts.
    # k1_tile widens the K2 row pass's lane panels (halves its grid and
    # doubles the panels feeding the stage matmuls — round-2 verdict item 2's
    # untried lever, viable since blocked-P streaming freed K-pass VMEM).
    # Only four-step plans consume it, and the twin is a no-op unless n1
    # exceeds the default 128 tile.  (``split`` resolved above.)  The round-3
    # verdict's four-step ask names k1_tile=512 explicitly, so the challenge
    # is a LADDER: after 256 beats 128, 512 challenges 256 (each rung
    # guarded by plan_works_on_device inside _twin_head_to_head).
    if not skip_knob_challenges and split is not None and split[0] >= 256:
        best_cfg, best_ns = _twin_head_to_head(
            n, best_cfg, best_ns, batch, precision,
            dataclasses.replace(
                best_cfg, k1_tile=256 if best_cfg.k1_tile == 128 else 128,
            ),
            audit=audit, resume=resume,
        )
        if best_cfg.k1_tile == 256 and split[0] >= 512:
            best_cfg, best_ns = _twin_head_to_head(
                n, best_cfg, best_ns, batch, precision,
                dataclasses.replace(best_cfg, k1_tile=512),
                audit=audit, resume=resume,
            )
    # Wider K1 lane panels (lane_tile=256 doubles the column pass's panel
    # width, halving its grid): the fused sweep only tries this at small n
    # (Mosaic stalls at large fused working sets), but a four-step K1 panel
    # is (n1, t) — small enough that the working set stays safe for every
    # cached split; VMEM is still checked by plan_works_on_device.
    if (not skip_knob_challenges and split is not None
            and best_cfg.lane_tile == 128):
        best_cfg, best_ns = _twin_head_to_head(
            n, best_cfg, best_ns, batch, precision,
            dataclasses.replace(best_cfg, lane_tile=256),
            audit=audit, resume=resume,
        )
    # Fused wide-lane challenge (round-4): the structural sweep caps fused
    # lane_tile at n <= 4096 (Mosaic-stall safety), but the round-4 S1
    # attribution shows the big-n grouped stage-2 is WEIGHT-FILL-bound at
    # 128 data columns per (2R, 2R) folded table — lane_tile=256 doubles the
    # columns each weight fill feeds without giving up the twiddle fold.
    # Only feasible jointly with bf16 state (f32 at t=256 exceeds the VMEM
    # budget; plan_works_on_device inside the twin guards either way), so
    # the challenger flips both knobs together.
    if (not skip_knob_challenges and split is None
            and best_cfg.strategy == "fused"
            and n > 4096 and best_cfg.lane_tile == 128
            and precision == "bfloat16"):
        best_cfg, best_ns = _twin_head_to_head(
            n, best_cfg, best_ns, batch, precision,
            dataclasses.replace(best_cfg, lane_tile=256,
                                state_dtype="bfloat16"),
            audit=audit, resume=resume,
        )
    if incumbent_cfg is not None and best_cfg != incumbent_cfg:
        # Same decision rule as the historical inline guard: the challenger
        # replaces the incumbent only by winning the interleaved compare.
        best_cfg, best_ns = _twin_head_to_head(
            n, incumbent_cfg, best_ns, batch, precision, best_cfg,
            audit=audit, resume=resume, tag="incumbent-guard",
        )
    entry = best_cfg.as_tuning()
    flops = 5.0 * n * float(np.log2(n)) * batch
    entry_out = dict(entry)
    entry_out["time_us"] = round(best_ns / 1e3, 2)
    entry_out["gflops"] = round(flops / best_ns, 1)
    if entry_out.get("radices") is not None:
        entry_out["radices"] = list(entry_out["radices"])
    if entry_out.get("four_step_split") is not None:
        entry_out["four_step_split"] = list(entry_out["four_step_split"])
    if dump_dir is not None:
        from tensorfft_tpu.testing.io import write_tuner_data

        # Non-headline-policy and batch-specific tables get their own
        # filenames so they never clobber the committed headline evidence.
        tag = "" if precision == "bfloat16" else f"_{precision}"
        tag += dump_tag
        tag += "_challenge" if challenge_only else ""
        write_tuner_data(n, batch, precision, audit, best_cfg.as_tuning(),
                         dump_dir, tag=tag)
    if cache is not None:
        if not np.isfinite(best_ns):
            # Every sweep config failed (VMEM prefilter, compile poison, or
            # measurement error).  Crowning an inf "winner" would persist a
            # config known NOT to run — create_plan(tuning="auto") must never
            # serve it (round-4 verdict weak #1: the n=16384 float32 entry).
            import warnings

            warnings.warn(
                f"tune(n={n}, precision={precision}): every config measured "
                f"non-finite; NOT persisting a winner to the cache",
                stacklevel=2,
            )
        else:
            platform = jax.devices()[0].platform
            cache.put(n, precision, platform, entry_out, batch=batch)
    if resume is not None:
        resume.done()
    return entry
