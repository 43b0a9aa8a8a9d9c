"""Persistent autotuning cache.

The analog of the reference's ``TunerResults.dat`` (written
FileWriter.h:250-269, parsed back by the file-driven CreatePlan overload,
Plan.h:197-255) — a JSON file keyed by (fft_length, precision, platform)
whose entries are ``tuning`` dicts consumed by
:func:`tensorfft_tpu.plan.create_plan`.
"""
from __future__ import annotations

import json
import math
import os
from pathlib import Path
from typing import Optional

__all__ = ["TunerCache", "default_cache_path"]

_VERSION = 1


def _finite(entry: Optional[dict]) -> bool:
    """An entry is servable only if its measurement metadata is finite.

    A poisoned sweep (every config failed) must never crown a production
    plan: round-4 shipped exactly that — an n=16384 float32 entry with
    time_us=Infinity whose config was known to fail compilation.
    """
    if entry is None:
        return False
    t = entry.get("time_us")
    return t is None or (isinstance(t, (int, float)) and math.isfinite(t))


def default_cache_path() -> Path:
    env = os.environ.get("TENSORFFT_TUNER_CACHE")
    if env:
        return Path(env)
    return Path(__file__).parent / "tuner_cache.json"


def _key(
    fft_length: int, precision: str, platform: str, batch: Optional[int] = None
) -> str:
    base = f"n={fft_length},precision={precision},platform={platform}"
    return base if batch is None else f"{base},batch={batch}"


class TunerCache:
    def __init__(self, path: Optional[os.PathLike] = None):
        self.path = Path(path) if path is not None else default_cache_path()
        self._entries: dict = {}
        if self.path.exists():
            data = json.loads(self.path.read_text())
            if data.get("version") == _VERSION:
                self._entries = data.get("entries", {})

    def get(
        self,
        fft_length: int,
        precision: str,
        platform: str,
        batch: Optional[int] = None,
    ) -> Optional[dict]:
        """Tuning dict for create_plan(tuning=...), or None if not tuned.

        With ``batch``, an entry tuned at that exact batch takes priority
        (lane-panel/grid tradeoffs shift with batch — round-1 verdict #8);
        the batch-blind entry is the fallback either way.
        """
        entry = None
        if batch is not None:
            entry = self._entries.get(
                _key(fft_length, precision, platform, batch)
            )
            if not _finite(entry):
                entry = None
        if entry is None:
            entry = self._entries.get(_key(fft_length, precision, platform))
            if not _finite(entry):
                entry = None
        if entry is None:
            return None
        tuning = dict(entry)
        tuning.pop("time_us", None)
        tuning.pop("gflops", None)
        tuning.pop("batch", None)
        if "radices" in tuning:
            tuning["radices"] = tuple(tuning["radices"])
        if "four_step_split" in tuning and tuning["four_step_split"] is not None:
            tuning["four_step_split"] = tuple(tuning["four_step_split"])
        else:
            tuning.pop("four_step_split", None)
        return tuning

    def put(
        self,
        fft_length: int,
        precision: str,
        platform: str,
        entry: dict,
        batch: Optional[int] = None,
    ):
        """Persist a winner.

        With ``batch``, the entry is stored under the exact-batch key AND
        promoted to the batch-blind key when it was tuned at a batch larger
        than the blind incumbent's (the blind entry represents the
        production/headline scale, not the smallest sweep).  An EQUAL-batch
        retune promotes only when it is not measurably slower (round-4
        verdict item 9: a worse equal-batch re-measurement must not demote a
        faster blind incumbent).  Non-finite measurements are rejected
        outright — a poisoned sweep may never enter the cache.
        """
        if not _finite(entry):
            raise ValueError(
                f"refusing to cache a non-finite tuner winner for "
                f"n={fft_length}, precision={precision}: {entry!r}"
            )
        if batch is not None:
            entry = dict(entry, batch=int(batch))
            self._entries[_key(fft_length, precision, platform, batch)] = entry
            blind = self._entries.get(_key(fft_length, precision, platform))
            blind_batch = -1 if blind is None else int(blind.get("batch", 0))
            promote = blind_batch < int(batch) or (
                blind_batch == int(batch)
                and float(entry.get("time_us", math.inf))
                <= float(blind.get("time_us", math.inf))
            )
            if not _finite(blind):
                promote = True
            if promote:
                self._entries[_key(fft_length, precision, platform)] = entry
        else:
            self._entries[_key(fft_length, precision, platform)] = entry

    def dedupe(self) -> int:
        """Drop batch-suffixed entries identical to their blind twin.

        A twin identical to the canonical blind entry is pure redundancy —
        get() falls back to the blind key — and the pair goes stale together
        when one is retuned (round-2 verdict item 7).  Runs on save(), so
        the persisted invariant is: every ``...,batch=B`` key differs from
        its blind key's entry.  Returns the number of entries removed.
        """
        drop = [
            k for k, v in self._entries.items()
            if ",batch=" in k
            and self._entries.get(k.rsplit(",batch=", 1)[0]) == v
        ]
        for k in drop:
            del self._entries[k]
        return len(drop)

    def save(self):
        self.dedupe()
        self.path.parent.mkdir(parents=True, exist_ok=True)
        # allow_nan=False: bare Infinity/NaN is not RFC 8259 JSON (jq/JS
        # reject the whole file) — fail fast here instead of committing a
        # cache no other tool can parse.
        self.path.write_text(
            json.dumps({"version": _VERSION, "entries": self._entries}, indent=1,
                       sort_keys=True, allow_nan=False)
        )

    def __len__(self):
        return len(self._entries)
