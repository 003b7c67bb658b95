"""bench.py stdout-tail contract (VERDICT r9 defect #1 regression
guard): the driver keeps only a ~2000-char tail of bench stdout and
json-parses its LAST line.  Round 9 lost its graded bench point because
a background StateStore thread logged a stack trace after the summary
line.  These tests pin the two halves of the fix:

1. emit_summary's final stdout line always parses and stays under the
   1500-char budget, for any registry size;
2. bench.main's source ordering quiesces the JVM (streams + StateStore
   + spark.stop) BEFORE any JSON is printed, so nothing can log after
   the summary line.
"""

from __future__ import annotations

import ast
import json
from pathlib import Path

import bench


class TestEmitSummary:
    def _last_line(self, capsys) -> str:
        out = capsys.readouterr().out.rstrip("\n").splitlines()
        assert len(out) == 2, "contract is exactly two lines: detail, summary"
        return out[-1]

    def test_last_line_parses_and_fits_budget(self, capsys):
        # registry-sized stub: 300 queries with long names, so the
        # summary MUST truncate to stay inside the budget
        timings = {f"some_quite_long_query_name_{i:04d}": i / 10 for i in range(300)}
        bench.emit_summary(timings, sf=0.1)
        last = self._last_line(capsys)
        assert len(last) < 1500
        summary = json.loads(last)
        assert summary["metric"] == "all_queries_wall"
        assert summary["n_queries"] == 300
        assert summary["value"] == round(sum(timings.values()), 3)
        # slowest-first truncation: every included query is >= any
        # excluded one
        included = summary["queries"]
        assert included
        floor = min(included.values())
        excluded = [v for k, v in timings.items() if k not in included]
        assert all(v <= floor for v in excluded)

    def test_empty_registry_still_parses(self, capsys):
        bench.emit_summary({}, sf=0.01)
        last = self._last_line(capsys)
        summary = json.loads(last)
        assert summary["n_queries"] == 0
        assert summary["value"] == 0

    def test_detail_line_carries_every_query(self, capsys):
        timings = {f"q{i}": 0.5 for i in range(50)}
        bench.emit_summary(timings, sf=0.1)
        out = capsys.readouterr().out.rstrip("\n").splitlines()
        detail = json.loads(out[0])
        assert set(detail["queries"]) == set(timings)

    def test_canary_scalars_in_summary_and_detail(self, capsys):
        # VERDICT r10 task #1: the fixed-cost canary rides both lines
        # so host overhead is separable from regression in-artifact
        timings = {f"some_quite_long_query_name_{i:04d}": i / 10 for i in range(300)}
        canary = {"first": [0.0123, 0.0101], "last": [0.0452, 0.0419]}
        bench.emit_summary(timings, sf=0.1, canary=canary)
        out = capsys.readouterr().out.rstrip("\n").splitlines()
        detail, summary = json.loads(out[0]), json.loads(out[-1])
        assert detail["canary"] == canary
        assert summary["canary_first_sec"] == 0.0101
        assert summary["canary_last_sec"] == 0.0419
        assert len(out[-1]) < 1500

    def test_stream_canary_scalars_in_summary_and_detail(self, capsys):
        # VERDICT r11 task #3: the streaming-lifecycle canary rides
        # both lines so availableNow start/stop host swings are
        # separable from real streaming-plan regressions
        timings = {f"some_quite_long_query_name_{i:04d}": i / 10 for i in range(300)}
        canary = {
            "first": [0.0123, 0.0101],
            "last": [0.0452, 0.0419],
            "stream_first": [0.9101, 0.8120],
            "stream_last": [1.1407, 1.0203],
        }
        bench.emit_summary(timings, sf=0.1, canary=canary)
        out = capsys.readouterr().out.rstrip("\n").splitlines()
        detail, summary = json.loads(out[0]), json.loads(out[-1])
        assert detail["canary"] == canary
        assert summary["canary_stream_first_sec"] == 0.8120
        assert summary["canary_stream_last_sec"] == 1.0203
        assert len(out[-1]) < 1500

    def test_budget_is_strict(self, capsys):
        # ADVICE r10: truncation must use >= so no final line can ever
        # reach 1500 chars, for ANY name/timing combination.  Names are
        # sized so the summary lands exactly around the boundary.
        for pad in range(40, 80):
            timings = {("n" * pad) + f"{i:03d}": 1.234 for i in range(60)}
            bench.emit_summary(timings, sf=0.1)
            last = capsys.readouterr().out.rstrip("\n").splitlines()[-1]
            assert len(last) < 1500
            assert json.loads(last)["n_queries"] == 60


class TestMainOrdering:
    """Static assertion on bench.main's source: the quiesce call (which
    stops streams/StateStore/session and silences logging) must come
    before emit_summary, so no JVM thread can write to stdout/stderr
    after the final JSON line."""

    def test_quiesce_precedes_emit(self):
        src = Path(bench.__file__).read_text()
        tree = ast.parse(src)
        main_fn = next(
            n
            for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name == "main"
        )
        calls = [
            node.func.id
            for node in ast.walk(main_fn)
            if isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
        ]
        assert "_quiesce" in calls and "emit_summary" in calls
        assert calls.index("_quiesce") < calls.index("emit_summary")

    def test_quiesce_stops_session_and_statestore(self):
        src = Path(bench.__file__).read_text()
        q = src[src.index("def _quiesce") : src.index("def emit_summary")]
        assert "spark.stop()" in q
        assert "StateStore.stop()" in q
        assert 'setLogLevel("OFF")' in q
