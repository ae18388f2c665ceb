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
