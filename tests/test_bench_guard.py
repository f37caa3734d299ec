"""bench.py regression guard: per-query medians vs the BEST prior
clean BENCH_r{N}.json numbers become a gate, not just a number (r5
verdict #2; r6 verdict #2 moved the baseline from newest-round to
best-of-history so ambient drift can't compound under the 1.5x gate).
No Spark session needed — the guard is pure JSON comparison."""

from __future__ import annotations

import importlib.util
import os

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(_here, "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_prior_bench_loads_best_of_history():
    prior = bench._prior_bench(0.1)
    # the repo carries several clean sf0.1 benches; the loader must
    # find per-query medians in them
    assert prior and all(isinstance(v, float) for v in prior.values())
    # best-of-history under the protocol filter (r11 advice #5):
    # contaminated rounds are never anchor material, and a key's
    # anchor is the min over CURRENT-protocol rounds when any exist,
    # else the min over legacy cold-start rounds
    import glob
    import json
    import os

    import re

    best_cur: dict[str, float] = {}
    best_old: dict[str, float] = {}
    files = [
        # same non-matching-name guard as bench.py:_prior_bench — the
        # driver commits sibling artifacts like BENCH_r16_c8.json (the
        # low-core scaling run) that the round regex must skip
        (f, int(m.group(1)))
        for f in glob.glob(os.path.join(_here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", f))
    ] + [
        # builder-recorded clean anchor runs are anchor material too
        # (never round-contaminated, never pre-reshape)
        (f, 10**6)
        for f in glob.glob(
            os.path.join(_here, "docs", "probes", "bench_anchor_*.json")
        )
    ]
    for f, rnd in files:
        d = json.load(open(f))
        parsed = d.get("parsed") or {}
        if d.get("rc") == 0 and d.get("sf") == 0.1:
            if rnd in bench.CONTAMINATED_ROUNDS:
                continue
            proto = parsed.get("pv", 2 if rnd >= 11 else 1)
            best = (
                best_cur if proto == bench.BENCH_PROTOCOL else best_old
            )
            for name, t in parsed.get("queries", {}).items():
                # rounds <= r6 recorded full names; the loader
                # normalizes to the short serialization key
                key = bench._short(name)
                if rnd < bench.RESHAPED_ROUND.get(key, 0):
                    # intentional algorithm change: pre-reshape
                    # history is not a baseline (bench.RESHAPED_ROUND)
                    continue
                if key not in best or t < best[key]:
                    best[key] = t
    assert prior == {**best_old, **best_cur}
    # contaminated driver runs (measured host steal) are never anchor
    # material: keys whose ONLY history is contaminated rounds must
    # have no anchor at all — they re-anchor from the first clean run.
    # Derive the key set from the files rather than hard-coding it so
    # a new BENCH_r{N}.json landing post-commit can't invalidate the
    # assertion (r12 verdict ask #1).
    contaminated_only: set[str] = set()
    clean_keys: set[str] = set()
    for f, rnd in files:
        d = json.load(open(f))
        if d.get("rc") != 0 or d.get("sf") != 0.1:
            continue
        keys = {
            bench._short(n)
            for n in (d.get("parsed") or {}).get("queries", {})
        }
        if rnd in bench.CONTAMINATED_ROUNDS:
            contaminated_only |= keys
        else:
            clean_keys |= keys
    for key in contaminated_only - clean_keys:
        assert key not in prior


def test_prior_bench_ignores_other_sf():
    assert bench._prior_bench(123.456) == {}


def test_prior_bench_composition_banding():
    """r12 verdict ask #7: per-key anchors are list-composition-
    dependent, so same-band history (>= BAND_MIN_RATIO of the current
    key count) wins per key, out-of-band history only backstops, and
    flags whose sole anchor is out-of-band carry the 'ob' marker."""
    legacy = bench._prior_bench(0.1)
    banded = bench._prior_bench(0.1, n_current=len(bench.HEADLINE))
    # banding re-ranks which run supplies each anchor but never
    # changes coverage, and a same-band preference can only select a
    # value >= the all-history minimum
    assert set(banded) == set(legacy)
    assert all(banded[k] >= legacy[k] for k in legacy)
    # a hypothetical much larger list has NO same-band history: every
    # anchor falls back out-of-band, and a regression flagged against
    # one is annotated 'ob' (weaker evidence — solo re-measure triage)
    assert bench._prior_bench(0.1, n_current=10_000, banded_only=True) == {}
    name, prev = next(iter(banded.items()))
    fat = {f"x{i}": 0.01 for i in range(10_000)}
    fat[name] = prev * 2 + bench.REGRESSION_FLOOR_S + 0.01
    regs = bench._find_regressions(fat, 0.1)
    assert regs[name].get("ob") is True


def test_guard_flags_only_real_regressions():
    # _find_regressions anchors within the COMPOSITION BAND of the
    # timing dict it is given (n_current = len(timings)), so the
    # expectation must be computed the same way
    legacy = bench._prior_bench(0.1)
    prior = bench._prior_bench(0.1, n_current=len(legacy))
    assert prior and set(prior) == set(legacy)
    name, prev = next(iter(prior.items()))

    # identical timings: no regressions
    assert bench._find_regressions(dict(prior), 0.1) == {}

    # 2x a prior median (and > floor absolute growth): flagged
    worse = dict(prior)
    worse[name] = prev * 2 + bench.REGRESSION_FLOOR_S + 0.01
    regs = bench._find_regressions(worse, 0.1)
    assert list(regs) == [name]
    assert regs[name]["prev"] == prev

    # sub-floor absolute growth is noise even when the ratio trips
    tiny = dict(prior)
    tiny[name] = prev * 1.6
    if tiny[name] - prev <= bench.REGRESSION_FLOOR_S:
        assert name not in bench._find_regressions(tiny, 0.1)

    # queries with no prior (new headline entries) are never flagged
    fresh = dict(prior)
    fresh["brand_new_query"] = 99.0
    assert "brand_new_query" not in bench._find_regressions(fresh, 0.1)


def test_short_keys_unique_over_headline():
    """The bench serializes timings under each query's leading code to
    fit the driver's 2000-byte output tail — the codes must stay
    unique or two queries would silently share a slot."""
    shorts = [bench._short(n) for n in bench.HEADLINE]
    assert len(set(shorts)) == len(shorts)
    # and the normalizer maps r6-era full names onto the same space
    assert bench._short("t34_curation_audit") == "t34"
    assert bench._short("q1_pricing_summary") == "q1"
