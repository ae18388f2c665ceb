"""Registry-packing invariants for the driver's bounded correctness sweep.

Round 5 replaced the hand-pinned window with the permanent
STALENESS-ROTATION ordering (VERDICT r4 item 1): ``tools/gen_window.py``
generates ``_CHECK_ORDER`` (whole registry, check-priority first) and
``_VERIFIED`` (every key with a green driver row) from the
CORRECTNESS_r*.json history plus the round's git diff.  These tests pin
the structural invariants that must hold regardless of when the
generator last ran.
"""

from __future__ import annotations

import json
import pathlib
import subprocess

import __spark_entry__ as entrypoint

#: Observed driver sweep size (each CORRECTNESS_r0N.json contained the
#: first ~50 registry entries).
DRIVER_WINDOW = 50

_REPO = pathlib.Path(__file__).resolve().parents[1]


def test_check_order_covers_registry():
    """The generated order is a permutation of the live registry; any key
    missing from it (added after the last gen_window run) packs at the
    very front — never behind a verified key."""
    qs = list(entrypoint.queries())
    order = [k for k in entrypoint._CHECK_ORDER if k in set(qs)]
    fresh = [k for k in qs if k not in set(entrypoint._CHECK_ORDER)]
    assert qs == fresh + order
    for k in fresh:
        assert k not in entrypoint._VERIFIED


def test_never_checked_keys_lead_the_window():
    """Every key without a driver-correctness row must sit inside the
    checked prefix, ahead of all re-verification traffic."""
    qs = list(entrypoint.queries())
    never = [k for k in qs if k not in entrypoint._VERIFIED]
    assert len(never) <= DRIVER_WINDOW, "never-checked backlog exceeds window"
    for k in never:
        assert qs.index(k) < len(never), f"{k} displaced by a verified key"


def test_touched_module_keys_inside_window():
    """VERDICT r4 item 1 done-criterion, amended by the r9 #2 staleness
    reservation: keys in modules changed since the round base occupy the
    checked prefix UP TO the window's unreserved share — ~half the
    post-never-checked window is reserved for the oldest driver
    evidence, so touch-heavy rounds can no longer starve the rotation.
    A touched key may therefore sit outside the window ONLY if every key
    ahead of it is itself never-checked, touched, or part of the
    reserved oldest tail (i.e. it overflowed the share and is first in
    line next round) — anything else ahead of it means the generator
    wasn't re-run after code edits."""
    from tools.gen_window import touched_modules

    try:
        touched = touched_modules(entrypoint._ORDER_BASE_COMMIT)
    except subprocess.CalledProcessError:  # not a git checkout (driver env)
        return
    qs = list(entrypoint.queries())
    key_module = {}
    for mod in entrypoint._MODULES:
        rel = mod.__file__.removeprefix(str(_REPO) + "/")
        for key in mod.QUERIES:
            key_module[key] = rel
    never = [k for k in qs if k not in entrypoint._VERIFIED]
    touched_keys = [
        k for k in qs if k in entrypoint._VERIFIED
        and key_module[k] in touched
    ]
    tail_keys = [
        k for k in qs if k in entrypoint._VERIFIED
        and key_module[k] not in touched
    ]
    # the generator's own arithmetic, not a hand-synced mirror — incl.
    # the r12 cohort-completion rule, which needs the oldest-cohort
    # size derived from the SAME pinned inputs the generator saw
    from tools.gen_window import (
        last_green_round,
        oldest_cohort_size,
        reservation_takes,
    )

    greens = last_green_round(
        _REPO, max_round=entrypoint._ORDER_BASIS_ROUND
    )
    cohort = oldest_cohort_size(greens, tail_keys)
    _, _, tail_take = reservation_takes(
        len(never), len(touched_keys), len(tail_keys), DRIVER_WINDOW, cohort
    )
    allowed_ahead = (
        set(never) | set(touched_keys) | set(tail_keys[:tail_take])
    )
    for k in touched_keys:
        idx = qs.index(k)
        if idx < DRIVER_WINDOW:
            continue
        displaced_by = [a for a in qs[:idx] if a not in allowed_ahead]
        assert not displaced_by, (
            f"{k} lives in round-touched {key_module[k]} but sits outside "
            f"the checked window behind {displaced_by[:5]} — re-run "
            "tools/gen_window.py --write"
        )


def test_touched_modules_sees_working_tree():
    """VERDICT r7 #7: the r6 AND r7 red-pytest class was `touched_modules`
    diffing ``base..HEAD``, which is blind to uncommitted edits — a window
    regen in the same commit as the code edits missed them.  The generator
    must see a working-tree-only edit."""
    from tools.gen_window import touched_modules

    try:
        subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=_REPO,
            check=True,
            capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return  # not a git checkout (driver env)
    # probe with a scratch UNTRACKED file: it must be seen (a new module
    # regenerated before `git add` is the same sequencing class), and a
    # crashed test run leaves only an untracked stray — never a mutated
    # tracked source (review r8: the previous in-place edit of report.py
    # could persist a probe comment into the real module on a hard kill)
    target = (
        _REPO
        / "mysqldump_to_parquet_spark"
        / "_gen_window_probe_scratch.py"
    )
    rel = "mysqldump_to_parquet_spark/_gen_window_probe_scratch.py"
    try:
        target.write_text("# gen-window sequencing probe (safe to delete)\n")
        assert rel in touched_modules("HEAD"), (
            "touched_modules is blind to working-tree-only module files — "
            "the r6/r7 window-regen sequencing bug has regressed"
        )
    finally:
        target.unlink(missing_ok=True)


def test_verified_set_has_no_stale_keys():
    qs = set(entrypoint.queries())
    stale = entrypoint._VERIFIED - qs
    assert not stale, f"_VERIFIED names unregistered queries: {stale}"


def test_verified_set_matches_driver_rows():
    """Every key in _VERIFIED must hold a green row (hash-match, or the
    rows-only check approx ops maximally get) in some CORRECTNESS_r*.json
    — the set must never be padded by hand."""
    green: set[str] = set()
    for path in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        for key, row in json.loads(path.read_text()).items():
            if row.get("hash_match") or row.get("err") == "no_oracle":
                green.add(key)
    unearned = entrypoint._VERIFIED - green
    assert not unearned, f"_VERIFIED keys with no green driver row: {unearned}"


def test_staleness_rotation_is_monotone():
    """Beyond the touched/never-checked head, re-verification order must
    follow driver-row age: a key whose latest green is round N must never
    precede one whose latest green is round M < N unless the younger key
    sits in a touched module or leads for another structural reason.
    Checked loosely: within the UNtouched, driver-verified tail the last
    green rounds are non-decreasing.

    Round-state robustness (VERDICT r6 #1): greens are derived from the
    rounds that EXISTED when the ordering was generated
    (``_ORDER_BASIS_ROUND``) and the SAME base commit the generator
    diffed against — so when the driver drops the next round's
    CORRECTNESS file (turning the just-checked window head into the
    freshest greens — the rotation policy *working*), the invariant
    keeps evaluating the generator's own inputs instead of inverting."""
    from tools.gen_window import last_green_round, touched_modules

    try:
        touched = touched_modules(entrypoint._ORDER_BASE_COMMIT)
    except subprocess.CalledProcessError:
        return
    greens = last_green_round(_REPO, max_round=entrypoint._ORDER_BASIS_ROUND)
    key_module = {}
    for mod in entrypoint._MODULES:
        rel = mod.__file__.removeprefix(str(_REPO) + "/")
        for key in mod.QUERIES:
            key_module[key] = rel
    tail = [
        k
        for k in entrypoint._CHECK_ORDER
        if k in greens and key_module.get(k) not in touched
    ]
    rounds = [greens[k] for k in tail]
    assert rounds == sorted(rounds), "staleness order violated in tail"


def test_every_key_documented_in_survey():
    """SURVEY.md §2 is the judge's line-by-line coverage checklist; every
    registered key must appear there — literally, or inside a compact
    slash group like `q_tpch_q2/q4/...` (fragments replace the full
    key's last _-component)."""
    import re

    # only coverage-TABLE rows count as documentation — a narrative
    # mention elsewhere must not satisfy the lint
    surv = "\n".join(
        ln for ln in open("SURVEY.md").read().splitlines()
        if ln.startswith("|")
    )
    expanded = set(re.findall(r"q_[a-z0-9_]+", surv))
    for group in re.findall(r"(q_[a-z0-9_]+(?:/[a-z0-9]+)+)", surv):
        parts = group.split("/")
        head = parts[0]
        prefix = head[: head.rfind(head.split("_")[-1])]
        expanded.update(prefix + frag for frag in parts[1:])
    missing = [k for k in entrypoint._CHECK_ORDER if k not in expanded]
    assert not missing, f"keys absent from SURVEY.md: {missing}"


def test_pack_order_reservation_arithmetic():
    """Unit-pin tools/gen_window.pack_order (r10 staleness reservation):
    never-checked keys lead unconditionally; touched keys take at most
    the unreserved share; ~half the remaining window is reserved for
    the oldest tail; overflow-touched keys sit IMMEDIATELY after the
    window; every bucket's internal order is preserved."""
    from tools.gen_window import pack_order

    never = [f"n{i}" for i in range(4)]
    touched = [f"t{i}" for i in range(40)]
    tail = [f"o{i}" for i in range(60)]
    w = 50

    order = pack_order(never, touched, tail, w)
    assert sorted(order) == sorted(never + touched + tail)  # permutation
    assert order[:4] == never  # never-checked lead
    window = order[:w]
    # reservation: 46 remaining slots → 23 reserved for the oldest tail
    assert window[4:27] == touched[:23]
    assert window[27:50] == tail[:23]
    # overflow-touched immediately after the window, then the rest of
    # the tail — each in original order
    assert order[50:67] == touched[23:]
    assert order[67:] == tail[23:]

    # touch-light round: tail fills every leftover slot
    order = pack_order(never, touched[:3], tail, w)
    assert order[:4] == never and order[4:7] == touched[:3]
    assert order[7:50] == tail[:43]

    # degenerate: never-checked alone overflows the window
    order = pack_order([f"n{i}" for i in range(60)], touched[:2], tail[:2], w)
    assert order[:60] == [f"n{i}" for i in range(60)]

    # r12 cohort-completion rule (VERDICT r11 #1): when the oldest tail
    # cohort fits the post-never window at all, it rotates ATOMICALLY —
    # touched keys that no longer fit overflow to first-in-line, they
    # do not leave a 1-key cohort remnant behind.  The r12 shape:
    # 0 never, 11 touched, 40-key oldest cohort, window 50.
    order = pack_order([], touched[:11], tail[:40], 50, oldest_cohort=40)
    assert order[:10] == touched[:10]  # touched shrank 11 → 10
    assert order[10:50] == tail[:40]  # the WHOLE cohort inside
    assert order[50] == touched[10]  # displaced touched: first in line
    # without the completion hint, the old arithmetic (39 tail) stands
    order = pack_order([], touched[:11], tail[:40], 50)
    assert order[:11] == touched[:11] and order[11:50] == tail[:39]
    # a cohort larger than the window can never displace ALL touched
    # keys below the arithmetic's own floor of zero — it just fills
    # whatever the never-checked head leaves
    order = pack_order([f"n{i}" for i in range(10)], touched[:11],
                       tail, 50, oldest_cohort=60)
    assert order[:10] == [f"n{i}" for i in range(10)]
    assert order[10:50] == tail[:40]  # rest of window all-tail


def test_bench_instrumentation_counters():
    """bench.py's draw-quality instruments (r11): /proc/stat steal and
    PSI CPU parse into the documented shapes, totals are monotone
    across two reads, and the load-gate record carries its verdict
    fields — the JSON contract BENCH_r*.json consumers read."""
    import time

    import bench

    c0 = bench._cpu_counters()
    p0 = bench._psi_cpu()
    assert set(c0) == {"steal", "total"} and c0["total"] >= 0
    assert set(p0) == {"avg10", "avg60", "total_us"}
    time.sleep(0.05)
    c1, p1 = bench._cpu_counters(), bench._psi_cpu()
    assert c1["total"] >= c0["total"]
    assert c1["steal"] >= c0["steal"]
    assert p1["total_us"] >= p0["total_us"]

    # raise the gate so the test never sits in the 90 s wait loop when
    # the suite itself has the host loaded
    orig = bench.LOAD_GATE
    bench.LOAD_GATE = float("inf")
    try:
        gate = bench._load_gate()
    finally:
        bench.LOAD_GATE = orig
    assert set(gate) == {
        "threshold", "waited_sec", "loadavg_at_gate", "verdict"
    }
    assert gate["verdict"] in ("ok", "loaded")
    assert gate["waited_sec"] == 0.0
