"""Tooling-surface pins (VERDICT r11 #5/#6).

No Spark session here — these tests must stay cheap enough that a doc
edit can run them in seconds.
"""

from __future__ import annotations

import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


# ---------------------------------------------------------------------------
# gen_scaling.py argument handling (VERDICT r11 #5): the old hand-rolled
# sys.argv scan made `--help` (or any typo'd flag) fall through to the
# multi-minute FULL regen.  Pin that --help prints usage and exits 0, an
# unknown flag exits 2, and neither path ever starts Spark.
# ---------------------------------------------------------------------------


def _run_gen_scaling(*argv: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_scaling.py"), *argv],
        capture_output=True,
        text=True,
        timeout=60,
    )


def test_gen_scaling_help_exits_without_spark():
    proc = _run_gen_scaling("--help")
    assert proc.returncode == 0
    assert "usage" in proc.stdout.lower()
    assert "--sf1" in proc.stdout and "--ann" in proc.stdout
    # Spark startup logs to stderr ("Setting default log level", JVM
    # warnings); a clean argparse exit produces none of it.
    assert "SparkSession" not in proc.stderr
    assert "log level" not in proc.stderr


def test_gen_scaling_unknown_flag_is_an_error_not_a_full_regen():
    proc = _run_gen_scaling("--sf1-typo")
    assert proc.returncode == 2
    assert "unrecognized arguments" in proc.stderr
    assert "SparkSession" not in proc.stderr


def test_gen_scaling_parse_args_mode_mapping():
    sys.path.insert(0, str(REPO / "tools"))
    try:
        from gen_scaling import parse_args
    finally:
        sys.path.pop(0)
    assert parse_args([]).sf1 is None
    assert parse_args(["--sf1"]).sf1 == "/tmp/sf1"
    assert parse_args(["--sf1", "/x"]).sf1 == "/x"
    # bare --ann means "no sf1 corpus dir" (const ""), main maps it to None
    assert parse_args(["--ann"]).ann == ""
    assert parse_args(["--ann", "/corp"]).ann == "/corp"
    ns = parse_args(["--ann", "/corp", "--sf10"])
    assert ns.ann == "/corp" and ns.sf10 == "/tmp/sf10"
    assert parse_args(["--sf10", "/big"]).sf10 == "/big"


# ---------------------------------------------------------------------------
# Markdown table lint (VERDICT r11 #6): SURVEY.md:262 once carried a row
# with a doubled oracle cell (and its neighbor a missing one) — every row
# of every table must parse with the header's column count.
# ---------------------------------------------------------------------------

_CODE_SPAN = re.compile(r"`[^`]*`")


def _cell_count(line: str) -> int:
    # pipes escaped as \| or inside backtick code spans are content
    stripped = _CODE_SPAN.sub("x", line.replace("\\|", "x")).strip()
    assert stripped.startswith("|") and stripped.endswith("|"), line
    return stripped.count("|") - 1


def _iter_tables(text: str):
    block: list[tuple[int, str]] = []
    for i, line in enumerate(text.splitlines(), 1):
        if line.lstrip().startswith("|"):
            block.append((i, line))
        else:
            if len(block) >= 2:
                yield block
            block = []
    if len(block) >= 2:
        yield block


def test_survey_and_coverage_tables_are_rectangular():
    for doc in ("SURVEY.md", "COVERAGE.md", "ARCHITECTURE.md"):
        text = (REPO / doc).read_text()
        for block in _iter_tables(text):
            header_n = _cell_count(block[0][1])
            for lineno, line in block:
                assert _cell_count(line) == header_n, (
                    f"{doc}:{lineno} has {_cell_count(line)} cells, "
                    f"header has {header_n}: {line[:120]}"
                )


# ---------------------------------------------------------------------------
# bench.py band verdicts (VERDICT r12 #1): the recorded BENCH total
# overstated two rounds running because the heavy tail had no confirm
# merge; the full-set merge plus these verdicts make a contended host
# self-report in the JSON.  Pure function — no Spark.
# ---------------------------------------------------------------------------


def test_bench_band_verdicts():
    sys.path.insert(0, str(REPO))
    import bench

    # every benched query must have an all-time floor entry (a new
    # bench query without one would silently never be band-checked)
    missing = [
        n for n in bench.BENCH_QUERY_NAMES if n not in bench.IDLE_FLOOR_SEC
    ]
    assert missing == [], f"bench queries without floor entries: {missing}"

    floors = bench.IDLE_FLOOR_SEC
    some = list(floors)[:3]
    # at-floor timings: no verdicts
    ok = {n: floors[n] for n in some}
    assert bench.band_verdicts_for(ok, 0.1) == {}
    # BAND_TOLERANCE is the edge: just under passes, over flags
    tol = bench.BAND_TOLERANCE
    edge = {
        some[0]: floors[some[0]] * (tol - 0.01),
        some[1]: floors[some[1]] * (tol + 0.25),
    }
    out = bench.band_verdicts_for(edge, 0.1)
    assert list(out) == [some[1]]
    assert out[some[1]]["ratio"] == round(tol + 0.25, 2)
    assert out[some[1]]["all_time"] == floors[some[1]]
    # off the table's sf0.1 conditions: never judged
    assert bench.band_verdicts_for(edge, 0.01) == {}
    # unknown queries (future additions) are skipped, not KeyErrored
    assert bench.band_verdicts_for({"q_not_yet_floored": 99.0}, 0.1) == {}


# ---------------------------------------------------------------------------
# bench.py settle-and-redraw contract (VERDICT r15 #7): the redraw is a
# one-directional floor merge, so its guard rails must be pinned — it may
# fire ONLY when the draw's own steal exceeds 1.5 %, it must record BOTH
# steal readings in the JSON, and it must never suppress the primary
# draw's numbers (idle_confirm and the one-line schema stay intact).
# Drives bench.main() end-to-end with the Spark surface and the timing
# passes stubbed, so the assertions cover the real assembly code.
# ---------------------------------------------------------------------------


def _drive_bench_main(monkeypatch, capsys, steal_deltas):
    """Run bench.main() with synthetic timing passes and /proc/stat
    readings; returns (parsed JSON, sleep calls).  ``steal_deltas`` is
    the sequence of (steal, total) counter readings main() will see."""
    import json

    sys.path.insert(0, str(REPO))
    import bench
    import __spark_entry__ as entrypoint

    class _Sink:
        def format(self, *_a):
            return self

        def mode(self, *_a):
            return self

        def save(self):
            return None

    class _FakeDF:
        write = _Sink()

    class _FakeSpark:
        def stop(self):
            return None

    names = list(bench.BENCH_QUERY_NAMES)
    registry = {n: (lambda spark, sf: _FakeDF()) for n in names}

    # main/confirm/redraw passes, in call order: the merged floor must
    # be the min across whichever passes ran
    passes = iter(
        [
            {n: 1.0 for n in names},  # main (min-of-REPS)
            {n: 0.9 for n in names},  # confirm (min-of-2)
            {n: 0.5 for n in names},  # redraw (min-of-2, if it fires)
        ]
    )
    counters = iter(steal_deltas)
    sleeps: list[float] = []

    monkeypatch.setattr(bench, "get_spark", lambda **_kw: _FakeSpark())
    monkeypatch.setattr(entrypoint, "queries", lambda: registry)
    monkeypatch.setattr(
        bench, "_time_queries", lambda *_a, **_kw: next(passes)
    )
    monkeypatch.setattr(bench, "_cpu_counters", lambda: next(counters))
    monkeypatch.setattr(
        bench,
        "_load_gate",
        lambda: {
            "threshold": bench.LOAD_GATE,
            "waited_sec": 0.0,
            "loadavg_at_gate": 0.0,
            "verdict": "ok",
        },
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")

    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(line), sleeps


def test_bench_redraw_fires_only_above_steal_bar(monkeypatch, capsys):
    """steal 3 % across the draw → the redraw fires, records its OWN
    steal reading alongside the primary one, and floors merge min."""
    out, sleeps = _drive_bench_main(
        monkeypatch,
        capsys,
        [
            {"steal": 0, "total": 1_000_000},  # draw start
            {"steal": 30_000, "total": 2_000_000},  # draw end → 3 %
            {"steal": 30_000, "total": 2_000_000},  # redraw start
            {"steal": 30_010, "total": 3_000_000},  # redraw end → 0.001 %
        ],
    )
    assert out["steal_pct"] == 3.0  # the PRIMARY reading is recorded
    assert out["redraw"] is not None
    assert out["redraw"]["steal_pct"] == 0.001  # ...and the redraw's own
    # floors are the min across all three passes
    assert all(v == 0.5 for v in out["queries"].values())
    assert out["value"] == round(0.5 * len(out["queries"]), 4)
    # the primary draw's numbers are NOT suppressed: idle_confirm still
    # reports the main-vs-confirm comparison (pre-merge), and the
    # redraw's own common-14 is recorded separately
    assert out["idle_confirm"]["common_14_recheck"] == round(0.9 * 14, 4)
    assert out["redraw"]["common_14_redraw"] == round(0.5 * 14, 4)
    assert sleeps == [45]  # the settle wait ran


def test_bench_redraw_stays_inert_below_steal_bar(monkeypatch, capsys):
    """steal ≤ 1.5 % → no redraw pass, no settle sleep, floors are the
    main/confirm min and the schema still carries redraw: null."""
    out, sleeps = _drive_bench_main(
        monkeypatch,
        capsys,
        [
            {"steal": 0, "total": 1_000_000},
            {"steal": 10_000, "total": 2_000_000},  # 1 % — below the bar
        ],
    )
    assert out["steal_pct"] == 1.0
    assert out["redraw"] is None
    assert sleeps == []
    assert all(v == 0.9 for v in out["queries"].values())
    # one-line JSON schema: the consumer-read keys are all present
    for key in (
        "metric",
        "value",
        "unit",
        "queries",
        "sf",
        "common_14_total",
        "steal_pct",
        "idle_confirm",
        "band_verdicts",
        "redraw",
        "cpus",
    ):
        assert key in out
