"""bench.py capture contract: exactly ONE JSON line on stdout, always —
success, flaky-then-recovered, and hard-down (null record with error) —
with bounded retry around backend init (round-3 outage: a ~20-min hang in
axon backend init followed by UNAVAILABLE produced rc=1 and an unparseable
traceback; BENCH_r03.json parsed=null)."""
import importlib.util
import json
import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)  # no real backoff
    return mod


GOOD = json.dumps({"metric": ("UC2 GQA fine-tune throughput "
                              "(bs256, semantic prior, AdamW)"),
                   "value": 1958.2, "unit": "QA pairs/sec/chip",
                   "vs_baseline": 9.32})


def _one_json_line(capsys):
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1, f"stdout must be exactly one line, got {lines}"
    return json.loads(lines[0])


def test_success_first_try(bench, capsys):
    calls = []

    def fake(args, timeout):
        calls.append(args)
        if args[0] == "-c":
            return True, "tpu\n", ""
        return True, "noise from plugin\n" + GOOD + "\n", ""

    bench._run_child = fake
    bench.main()
    rec = _one_json_line(capsys)
    assert rec["value"] == 1958.2 and rec["vs_baseline"] == 9.32
    assert len(calls) == 2        # one preflight + one measurement


def test_recovers_after_flaky_preflights(bench, capsys):
    state = {"n": 0}

    def fake(args, timeout):
        if args[0] == "-c":
            state["n"] += 1
            if state["n"] < 3:    # two hangs/UNAVAILABLEs, then recovery
                return False, "", "timeout after 360s"
            return True, "tpu\n", ""
        return True, GOOD + "\n", ""

    bench._run_child = fake
    bench.main()
    rec = _one_json_line(capsys)
    assert rec["value"] == 1958.2


def test_hard_down_emits_null_record(bench, capsys):
    bench._run_child = lambda args, timeout: (
        False, "", "RuntimeError: Unable to initialize backend 'axon': "
                   "UNAVAILABLE")
    bench.main()
    rec = _one_json_line(capsys)
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert "UNAVAILABLE" in rec["error"]
    assert rec["metric"] == bench.METRIC


def test_measurement_garbage_output_retries_then_null(bench, capsys):
    """A measurement child that exits 0 but prints no record (e.g. a plugin
    swallowed stdout) must not be treated as success."""
    bench._run_child = lambda args, timeout: (True, "tpu\nnot json\n", "")
    bench.main()
    rec = _one_json_line(capsys)
    assert rec["value"] is None
    assert "no JSON record" in rec["error"]
