"""Unit tests for the bench.py orchestrator logic (no TPU, no model build).

The orchestrator is the driver's capture path — a logic bug here zeroes a
round's headline, so the attempt planning and flag plumbing are pinned.
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.quick

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _args(bench, argv):
    return bench.build_parser().parse_args(argv)


def test_headline_ladder_default(bench):
    ladder, flags = bench.build_attempt_plan(_args(bench, []))
    assert ladder == [24, 24, 16, 8, 8]
    assert flags == ["--size", "large-v1"]


def test_headline_ladder_small_batch(bench):
    ladder, _ = bench.build_attempt_plan(_args(bench, ["--batch", "8"]))
    assert ladder == [8, 8]  # no fallback above the requested batch
    ladder, _ = bench.build_attempt_plan(_args(bench, ["--batch", "12"]))
    assert ladder[0] == 12  # non-ladder batch leads, then falls back
    assert 8 in ladder


def test_preset_plan_uses_config_batch(bench):
    ladder, flags = bench.build_attempt_plan(
        _args(bench, ["--config", "large-beam"]))
    assert all(b is None for b in ladder)  # batch comes from CONFIGS
    assert flags == ["--config", "large-beam"]


def test_serving_plan(bench):
    ladder, flags = bench.build_attempt_plan(_args(bench, ["--serving"]))
    assert ladder == [24, 24, 12]
    assert "--serving" in flags


def test_passthrough_flags_roundtrip(bench):
    args = _args(bench, ["--no-kv-quant", "--kv-bits", "4", "--tokens", "32"])
    flags = bench.passthrough_flags(args)
    re_args = _args(bench, flags)
    assert re_args.kv_quant is False
    assert re_args.kv_bits == 4
    assert re_args.tokens == 32
    assert re_args.weight_quant is True  # untouched defaults survive


def test_resident_is_headline_only(bench):
    """--resident must reach the headline worker but never ride
    passthrough_flags into the preset/serving sweep (presets measure the
    default pipeline, transfer included)."""
    args = _args(bench, ["--resident"])
    _, mode = bench.build_attempt_plan(args)
    assert "--resident" in mode
    assert "--resident" not in bench.passthrough_flags(args)
    _, preset_mode = bench.build_attempt_plan(
        _args(bench, ["--resident", "--config", "large-beam"]))
    assert "--resident" not in preset_mode


def test_words_is_headline_only(bench):
    """--words must reach the headline worker but never ride
    passthrough_flags into the preset sweep (the sweep adds its own
    informational headline-words row)."""
    args = _args(bench, ["--words"])
    _, mode = bench.build_attempt_plan(args)
    assert "--words" in mode
    assert "--words" not in bench.passthrough_flags(args)
    _, preset_mode = bench.build_attempt_plan(
        _args(bench, ["--words", "--config", "large-beam"]))
    assert "--words" not in preset_mode


def test_configs_cover_all_baseline_presets(bench):
    assert set(bench.CONFIGS) == {
        "tiny-single", "base-10min", "small-low", "medium-translate",
        "large-beam",
    }


def test_failure_path_emits_valid_json_rc0():
    """Total failure must still print one parseable JSON line and exit 0 —
    the driver records rc and the line; a traceback loses the round."""
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py"),
         "--size", "tiny", "--budget", "1", "--no-presets"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["degraded"] is True
    assert rec["unit"] == "audio-sec/sec"
    assert {"metric", "value", "vs_baseline"} <= set(rec)


def test_beam_flag_reaches_headline_worker_only(bench):
    """--beam must ride the headline mode flags (the worker subprocess
    otherwise silently measures greedy), but must NOT ride
    passthrough_flags into the preset sweep — presets pin their own beam."""
    args = _args(bench, ["--beam", "5"])
    _, mode = bench.build_attempt_plan(args)
    assert "--beam" in mode and mode[mode.index("--beam") + 1] == "5"
    assert "--beam" not in bench.passthrough_flags(args)

    _, mode_default = bench.build_attempt_plan(_args(bench, []))
    assert "--beam" not in mode_default


def test_sweep_merges_and_never_nulls_prior_rows(bench, tmp_path,
                                                 monkeypatch, capsys):
    """VERDICT r3 weak-1: a failed/unreached sweep row must keep the
    previously-captured value (marked stale) instead of overwriting it
    with null, and fresh captures must replace rows and stamp a time."""
    out = tmp_path / "BENCH_CONFIGS.json"
    prior = {
        "headline": {"value": 300.0, "metric": "m", "unit": "audio-sec/sec"},
        "presets": {
            "small-low": {"value": 522.65, "unit": "audio-sec/sec"},
            "large-beam": {"value": 101.1, "unit": "audio-sec/sec"},
        },
        "serving": {"value": 183.7, "unit": "audio-sec/sec"},
        "streaming": {"value": 142.55, "unit": "audio-sec/sec"},
    }
    out.write_text(json.dumps(prior))
    monkeypatch.setenv("BENCH_CONFIGS_PATH", str(out))
    monkeypatch.setattr(bench, "wait_for_health", lambda deadline: 0.1)

    def fake_worker(flags, timeout):
        assert timeout > 0
        if "--config" in flags:
            name = flags[flags.index("--config") + 1]
            if name == "small-low":
                return None, "simulated compile timeout"
            return {"value": 111.0, "unit": "audio-sec/sec",
                    "metric": name, "vs_baseline": 2.2}, None
        if "--streaming" in flags:
            return None, "simulated slump"
        # headline / serving / extract / info rows
        return {"value": 333.0, "unit": "audio-sec/sec",
                "metric": "hl", "vs_baseline": 6.66}, None

    monkeypatch.setattr(bench, "run_worker", fake_worker)
    args = _args(bench, ["--budget", "100000"])
    rc = bench.orchestrate(args)
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][0]
    assert json.loads(line)["value"] == 333.0

    sweep = json.loads(out.read_text())
    # fresh captures replaced rows and are stamped
    assert sweep["headline"]["value"] == 333.0
    assert "captured_at" in sweep["headline"]
    assert sweep["presets"]["large-beam"]["value"] == 111.0
    assert not sweep["presets"]["large-beam"].get("stale")
    assert sweep["serving"]["value"] == 333.0
    assert sweep["extract"]["value"] == 333.0
    # failed rows KEEP the prior value, marked stale with the error
    assert sweep["presets"]["small-low"]["value"] == 522.65
    assert sweep["presets"]["small-low"]["stale"] is True
    assert "compile timeout" in sweep["presets"]["small-low"]["last_error"]
    assert sweep["streaming"]["value"] == 142.55
    assert sweep["streaming"]["stale"] is True
    # info rows captured
    assert sweep["headline-resident-input"]["value"] == 333.0
    assert sweep["headline-words"]["value"] == 333.0


def test_sweep_budget_reservation_protects_tail(bench, tmp_path,
                                                monkeypatch, capsys):
    """The headline phase may not eat the whole budget: with a tight
    budget every core row still gets attempted (or lands a skip marker),
    and prior rows survive."""
    out = tmp_path / "BENCH_CONFIGS.json"
    out.write_text(json.dumps(
        {"presets": {"medium-translate": {"value": 388.4,
                                          "unit": "audio-sec/sec"}}}))
    monkeypatch.setenv("BENCH_CONFIGS_PATH", str(out))
    monkeypatch.setattr(bench, "wait_for_health", lambda deadline: 0.1)
    calls = []

    def fake_worker(flags, timeout):
        calls.append(list(flags))
        return {"value": 260.0, "unit": "audio-sec/sec", "metric": "x",
                "vs_baseline": 5.2}, None

    monkeypatch.setattr(bench, "run_worker", fake_worker)
    rc = bench.orchestrate(_args(bench, ["--budget", "100000"]))
    assert rc == 0
    # every core row was attempted exactly once (all succeeded)
    joined = [" ".join(c) for c in calls]
    for frag in ("--config large-beam", "--config small-low",
                 "--config tiny-single", "--config base-10min",
                 "--config medium-translate", "--serving", "--streaming 8",
                 "--extract"):
        assert sum(frag in j for j in joined) == 1, frag
    sweep = json.loads(out.read_text())
    assert sweep["presets"]["medium-translate"]["value"] == 260.0


def test_draft_flag_is_headline_only(bench):
    """--draft rides the headline mode flags but never passthrough_flags
    (presets measure the default non-speculative pipeline)."""
    args = _args(bench, ["--draft", "base"])
    _, mode = bench.build_attempt_plan(args)
    assert "--draft" in mode and mode[mode.index("--draft") + 1] == "base"
    assert "--draft" not in bench.passthrough_flags(args)
    _, preset_mode = bench.build_attempt_plan(
        _args(bench, ["--draft", "base", "--config", "large-beam"]))
    assert "--draft" not in preset_mode
