"""Differential property tests for the r2 operators: each optimized plan
shape is compared against its naive (obviously-correct) formulation on
randomized inputs — a stronger check than the fixed-fixture oracle,
because the randomness explores boundary alignments the fixture can't.

Seeded ``random`` (not Hypothesis) keeps Spark-job-per-example costs
bounded: a handful of generated datasets per test, each compared exactly.
"""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from mysqldump_to_parquet_spark.llm.quality import _runlen_entropy_fold


def _random_events(rng, n):
    base = datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        # cluster timestamps so bin-boundary adjacency actually occurs,
        # including sub-second fractions right at 10-minute edges
        sec = rng.choice(
            [
                rng.uniform(0, 3600),
                600 * rng.randint(0, 6) + rng.choice([0, 0.001, 599.999, 600.0]),
            ]
        )
        rows.append(
            (
                i,
                base + timedelta(seconds=sec),
                rng.choice(["purchase", "error"]),
                round(rng.uniform(0, 100), 3),
            )
        )
    return rows


def test_interval_join_matches_naive_theta(spark):
    """Bin-blocked interval join ≡ naive range-predicate join, including
    events exactly on and just across bin boundaries."""
    rng = random.Random(42)
    for trial in range(3):
        rows = _random_events(rng, 300)
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )
        p = ev.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
        )
        e = ev.where(F.col("event_type") == "error").select(
            F.col("ts").alias("e_ts"), "value"
        )
        naive = (
            p.join(
                e,
                (F.col("e_ts") >= F.col("p_ts"))
                & (F.col("e_ts") < F.col("p_ts") + F.expr("INTERVAL 10 MINUTES")),
            )
            .groupBy("purchase_id")
            .agg(F.count(F.lit(1)).alias("n_errors"))
        )
        bin_s = 600
        b = F.floor(F.unix_timestamp("p_ts") / bin_s)
        blocked = (
            p.select("purchase_id", "p_ts", F.explode(F.array(b, b + 1)).alias("bin"))
            .join(
                e.select(
                    "e_ts", F.floor(F.unix_timestamp("e_ts") / bin_s).alias("bin")
                ),
                "bin",
            )
            .where(
                (F.col("e_ts") >= F.col("p_ts"))
                & (F.col("e_ts") < F.col("p_ts") + F.expr("INTERVAL 10 MINUTES"))
            )
            .groupBy("purchase_id")
            .agg(F.count(F.lit(1)).alias("n_errors"))
        )
        got = {r.purchase_id: r.n_errors for r in blocked.collect()}
        want = {r.purchase_id: r.n_errors for r in naive.collect()}
        assert got == want, f"trial {trial}: {got} != {want}"


def test_entropy_fold_matches_python(spark):
    """The zero-shuffle run-length entropy fold ≡ a direct Python
    computation over the same token lists (incl. single-token and
    all-identical docs)."""
    rng = random.Random(7)
    vocab = ["a", "b", "c", "dd", "eee"]
    docs = [
        [rng.choice(vocab) for _ in range(rng.randint(1, 40))] for _ in range(50)
    ]
    docs.append(["x"])           # single token: max entropy 0
    docs.append(["y"] * 10)      # all identical: entropy 0
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], "doc_id long, text string"
    )
    out = df.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n"),
        _runlen_entropy_fold(F.array_sort(F.split("text", " "))).alias("s"),
    ).collect()
    for r in out:
        toks = docs[r.doc_id]
        n = len(toks)
        counts = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        want_sumcln = sum(c * math.log(c) for c in counts.values())
        assert r.n == n
        assert r.s.nd == len(counts)
        assert abs(r.s.sumcln - want_sumcln) < 1e-9, (r.doc_id, r.s, want_sumcln)


def test_unpivot_roundtrips_pivot(spark):
    """unpivot(pivot(x)) recovers the original long-form aggregate."""
    rng = random.Random(3)
    rows = [
        (rng.choice(["p1", "p2", "p3"]), rng.choice(["F", "O"]), rng.uniform(0, 10))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "prio string, status string, v double")
    long_form = {
        (r.prio, r.status): r.s
        for r in df.groupBy("prio", "status").agg(F.sum("v").alias("s")).collect()
    }
    wide = df.groupBy("prio").pivot("status", ["F", "O"]).sum("v")
    back = wide.unpivot(
        ids=["prio"], values=["F", "O"], variableColumnName="status",
        valueColumnName="s",
    ).where(F.col("s").isNotNull())
    got = {(r.prio, r.status): r.s for r in back.collect()}
    assert set(got) == set(long_form)
    for k in got:
        assert abs(got[k] - long_form[k]) < 1e-9


def test_mad_outlier_flags_match_python(spark):
    """MAD flags ≡ a NumPy/pure-Python computation per group."""
    rng = random.Random(11)
    rows = []
    for g in ("a", "b"):
        for i in range(101):
            rows.append((g, rng.gauss(50, 5)))
        rows.append((g, 500.0))  # planted outlier
    df = spark.createDataFrame(rows, "g string, value double")
    med = df.groupBy("g").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = (
        df.join(F.broadcast(med), "g")
        .groupBy("g")
        .agg(
            F.first("med").alias("med"),
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad"),
        )
    )
    flagged = (
        df.join(F.broadcast(dev), "g")
        .where(F.abs(F.col("value") - F.col("med")) / (1.4826 * F.col("mad")) > 3.0)
        .collect()
    )
    # python reference
    import statistics

    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    want = set()
    for g, vs in by_g.items():
        m = statistics.median(vs)
        mad = statistics.median([abs(v - m) for v in vs])
        want |= {(g, v) for v in vs if abs(v - m) / (1.4826 * mad) > 3.0}
    assert {(r.g, r.value) for r in flagged} == want
    assert {("a", 500.0), ("b", 500.0)} <= want  # planted outliers caught


def test_histogram_approx_agrees_with_exact(spark):
    """The sketch-boundary histogram (100 TB path) must bucket within
    tolerance of the exact global-ntile deciles: 10 buckets, all rows
    accounted for, every bucket within 20% of N/10, and no
    single-partition exchange in the sketch plan."""
    from mysqldump_to_parquet_spark.operators.aggregates import (
        HIST_EQ_BUCKETS,
        agg_histogram_approx,
    )
    from mysqldump_to_parquet_spark.plans.lint import lint_plan

    sf = "/root/testdata/sf0.001"
    rows = sorted(agg_histogram_approx(spark, sf).collect(), key=lambda r: r.bucket)
    n = sum(r.n_orders for r in rows)
    from mysqldump_to_parquet_spark.catalog import load_table

    assert n == load_table(spark, sf, "orders").count()
    assert len(rows) == HIST_EQ_BUCKETS
    target = n / HIST_EQ_BUCKETS
    for r in rows:
        assert abs(r.n_orders - target) <= 0.2 * target + 1, rows
    # buckets are ordered, contiguous ranges
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
    # the scale contract: the data path has no GLOBAL SORT (the exact
    # ntile form's cost); the only exchange-to-one is the 1-row boundary
    # aggregate, documented in the plan-lint allowlist
    from mysqldump_to_parquet_spark.plans.lint import GLOBAL_SORT

    codes = {f.split(":", 1)[0] for f in lint_plan(agg_histogram_approx(spark, sf))}
    assert GLOBAL_SORT not in codes


def test_weighted_median_approx_brackets_exact(spark):
    """The sketch-bucketed weighted median (100 TB path) must bracket
    the exact cumulative-weight-window answer: for every return flag the
    exact weighted median lies in the crossing bucket's [lo, hi], the
    total weight matches exactly, and the plan has no global sort."""
    from mysqldump_to_parquet_spark.operators.aggregates import (
        agg_weighted_median,
        agg_weighted_median_approx,
    )
    from mysqldump_to_parquet_spark.plans.lint import GLOBAL_SORT, lint_plan

    sf = "/root/testdata/sf0.001"
    exact = {
        r.l_returnflag: r for r in agg_weighted_median(spark, sf).collect()
    }
    approx = {
        r.l_returnflag: r
        for r in agg_weighted_median_approx(spark, sf).collect()
    }
    assert approx.keys() == exact.keys()
    for flag, a in approx.items():
        e = exact[flag]
        assert a.median_lo <= e.weighted_median_price <= a.median_hi, (
            flag, a, e.weighted_median_price,
        )
        assert a.total_weight == e.total_weight
    codes = {
        f.split(":", 1)[0]
        for f in lint_plan(agg_weighted_median_approx(spark, sf))
    }
    assert GLOBAL_SORT not in codes


def test_skyline_matches_naive_dominance(spark):
    """Two-stage blocked skyline ≡ brute-force dominance filter on random
    point sets (duplicate x/y values included so boundary ties occur)."""
    rng = random.Random(7)
    from mysqldump_to_parquet_spark.operators import relational as R

    for trial in range(3):
        pts = {
            (float(rng.randint(0, 30)), float(rng.randint(0, 1000)) / 4)
            for _ in range(250)
        }
        naive = {
            p
            for p in pts
            if not any(
                q[0] >= p[0] and q[1] <= p[1] and (q[0] > p[0] or q[1] < p[1])
                for q in pts
            )
        }
        df = spark.createDataFrame(
            [(x, y) for x, y in pts], "qty double, price double"
        )

        def sweep(d, part):
            from pyspark.sql import Window

            w = (
                Window.partitionBy(*part)
                .orderBy(F.desc("qty"), F.asc("price"))
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            mp = F.min("price").over(w)
            return (
                d.withColumn("__m", mp)
                .where(F.col("__m").isNull() | (F.col("price") < F.col("__m")))
                .drop("__m")
            )

        blocked = df.withColumn(
            "blk", F.abs(F.hash("qty")) % R.SKYLINE_BLOCKS
        )
        got = {
            (r.qty, r.price)
            for r in sweep(sweep(blocked, ["blk"]).drop("blk"), []).collect()
        }
        assert got == naive, f"trial {trial}: {got ^ naive}"


def test_canonicalize_url_idempotent_and_correct(spark):
    """canon(canon(u)) == canon(u), and known messy spellings collapse to
    the expected canonical form."""
    from mysqldump_to_parquet_spark.llm.scrub import canonicalize_url

    cases = [
        ("HTTPS://WWW.Example3.COM/a/b", "https://example3.com/a/b"),
        ("https://example.com/a/?utm_source=x", "https://example.com/a"),
        ("https://example.com/a?utm_source=x&id=7", "https://example.com/a?id=7"),
        ("https://example.com/a?id=7#frag", "https://example.com/a?id=7"),
        ("http://www.example.com/", "http://example.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    got = [r.c for r in once.collect()]
    assert got == [want for _, want in cases], got
    twice = once.select(canonicalize_url(F.col("c")).alias("c2"))
    assert [r.c2 for r in twice.collect()] == got


def test_kmeans_partitions_the_corpus(spark, sf_dir):
    """Final k-means centroids: every cluster id within [0, K), member
    counts sum to the corpus size, all DIM positions present per cluster."""
    from mysqldump_to_parquet_spark.llm import vectors as V

    rows = V.kmeans(spark, sf_dir).collect()
    clusters = {}
    for r in rows:
        clusters.setdefault(r.cluster, set()).add(r.pos)
        assert 0 <= r.cluster < V.KMEANS_K
    for poss in clusters.values():
        assert poss == set(range(V.DIM))
    n_total = {r.cluster: r.n_vecs for r in rows}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(n_total.values()) == emb


def test_bfs_distances_are_consistent(spark, sf_dir):
    """BFS output: source at 0, hops within the cap, and every non-source
    node at distance d has SOME neighbour at d-1 (spot-checked via the
    edge list)."""
    from mysqldump_to_parquet_spark.operators import graph as G

    dist = {r.node: r.dist for r in G.graph_bfs(spark, sf_dir).collect()}
    assert dist[G.BFS_SOURCE] == 0
    assert all(0 <= d <= G.BFS_MAX_HOPS for d in dist.values())
    edges = G._edges(spark, sf_dir).collect()
    nbrs = {}
    for e in edges:
        nbrs.setdefault(e.dst, set()).add(e.src)
    import random as _r

    rng = _r.Random(3)
    sample = rng.sample(sorted(dist), min(50, len(dist)))
    for node in sample:
        d = dist[node]
        if d == 0:
            continue
        assert any(dist.get(p) == d - 1 for p in nbrs.get(node, ())), node


def test_bfs_hub_degree_segmentation(spark):
    """A synthetic 50k-degree hub must not produce one giant adjacency
    row: the list is hash-segmented into ~degree/cap rows (bounded
    per-row memory, parallel hub expansion), every neighbor lands in
    exactly one segment, and BFS distances are unchanged."""
    from mysqldump_to_parquet_spark.operators.graph import _adjacency, _bfs

    n = 50_000
    fwd = spark.range(n).select(
        F.lit("h").alias("src"),
        F.concat(F.lit("n"), F.col("id")).alias("dst"),
    )
    both = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    segs = [
        r.sz
        for r in _adjacency(both, cap=10_000)
        .where(F.col("src") == "h")
        .select(F.size("nbrs").alias("sz"))
        .collect()
    ]
    assert len(segs) == 5  # ceil(50k / 10k) hash segments, none dropped
    assert sum(segs) == n
    assert max(segs) < 15_000  # hash fill stays near the cap — no straggler row
    dist = {r.node: r.dist for r in _bfs(spark, both, "h", 3).collect()}
    assert dist["h"] == 0
    assert len(dist) == n + 1
    assert all(d == 1 for node, d in dist.items() if node != "h")


def test_bfs_last_two_frontier_settle_is_exact(spark):
    """The r8 undirected optimization — anti-joining only the LAST TWO
    frontiers instead of every settled node — must be EXACT: on an
    undirected graph dist differs by ≤1 across an edge, so a neighbor of
    a hop-k node is settled at k-1 or k if at all.  Differential against
    the full-union settle (undirected=False) on random undirected graphs,
    including a long path (where every hop count matters) and a dense
    core (where re-discovery pressure is highest)."""
    import random as _r

    from mysqldump_to_parquet_spark.operators.graph import _bfs

    rng = _r.Random(17)
    for trial in range(3):
        n = 60 + 30 * trial
        pairs = {(f"n{i}", f"n{i+1}") for i in range(12)}  # a long path
        while len(pairs) < n * 2:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                pairs.add((f"n{a}", f"n{b}"))
        fwd = spark.createDataFrame(sorted(pairs), "src string, dst string")
        both = fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        fast = {
            (r.node, r.dist)
            for r in _bfs(spark, both, "n0", 8, undirected=True).collect()
        }
        full = {
            (r.node, r.dist)
            for r in _bfs(spark, both, "n0", 8, undirected=False).collect()
        }
        assert fast == full, (trial, fast ^ full)


def test_spatial_blocking_loses_no_pairs(spark):
    """Grid-blocked spatial join ≡ naive cross-join + haversine filter on
    random coordinates, including antimeridian-straddling and
    high-latitude points (the two blocking failure modes)."""
    from mysqldump_to_parquet_spark.operators import spatial as S

    rng = random.Random(11)
    pts = []
    for i in range(200):
        # bias toward the hard cases: the ±180 seam and high latitudes
        lon = rng.choice(
            [rng.uniform(-180, 180), rng.uniform(178, 180), rng.uniform(-180, -178)]
        )
        lat = rng.choice([rng.uniform(-85, 85), rng.uniform(80, 85)])
        pts.append((i, round(lat, 3), round(lon, 3)))

    probes = pts[:60]
    import math as m

    def hav(a, b):
        la1, lo1, la2, lo2 = map(m.radians, (a[1], a[2], b[1], b[2]))
        x = (
            m.sin((la2 - la1) / 2) ** 2
            + m.cos(la1) * m.cos(la2) * m.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0 * m.asin(min(1.0, m.sqrt(x)))

    naive = {
        (p[0], q[0])
        for p in probes
        for q in pts
        if hav(p, q) <= S.RADIUS_KM
    }

    cdf = spark.createDataFrame(probes, "id long, lat double, lon double")
    sdf = spark.createDataFrame(pts, "sid long, slat double, slon double")
    band = S._band(F.col("lat"))
    cust = cdf.select(
        "id", "lat", "lon", band.alias("band"),
        S._lon_cell(F.col("lon"), band).alias("lcell"),
    )
    nb = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("db")
    sb = sdf.select("*", nb).select(
        "sid", "slat", "slon",
        (S._band(F.col("slat")) + F.col("db")).alias("band"),
    )
    nl = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dl")
    sc = sb.select("*", nl).select(
        "sid", "slat", "slon", "band",
        F.pmod(
            S._lon_cell(F.col("slon"), F.col("band")) + F.col("dl"),
            S._ncells(F.col("band")),
        ).alias("lcell"),
    )
    d = S._haversine_km(F.col("lat"), F.col("lon"), F.col("slat"), F.col("slon"))
    got = {
        (r.id, r.sid)
        for r in cust.join(sc, ["band", "lcell"])
        .select("id", "sid", d.alias("km"))
        .where(F.col("km") <= S.RADIUS_KM)
        .distinct()
        .collect()
    }
    missed = naive - got
    assert not missed, f"blocking lost pairs: {sorted(missed)[:10]}"
    assert got == naive  # verify step must also not ADD pairs


def test_cdc_apply_tombstone_semantics(spark, tmp_path):
    """CDC compaction: last-op-wins per key, tombstoned keys vanish,
    surviving keys carry the exact latest (ts, value)."""
    from datetime import datetime

    from mysqldump_to_parquet_spark.operators.temporal import cdc_apply

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    # event_id % 20 == 0 is a DELETE
    rows = [
        # user 1: upsert then tombstone LAST -> absent
        (1, t(1), 1, "click", 10.0, "{}"),
        (20, t(2), 1, "click", 11.0, "{}"),
        # user 2: tombstone then upsert LAST -> present, value 30.5
        (40, t(1), 2, "click", 99.0, "{}"),
        (3, t(5), 2, "click", 30.5, "{}"),
        # user 3: same ts twice; higher event_id wins -> value 2.0
        (5, t(7), 3, "click", 1.0, "{}"),
        (7, t(7), 3, "click", 2.0, "{}"),
        # user 4: only a tombstone -> absent
        (60, t(9), 4, "click", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        r.user_id: (r.last_ts, r.last_value)
        for r in cdc_apply(spark, str(tmp_path)).collect()
    }
    assert set(got) == {2, 3}
    assert got[2] == (t(5), 30.5)
    assert got[3] == (t(7), 2.0)


def test_sessionize_matches_python_reference(spark, tmp_path):
    """Differential for q_sessionize (red in driver rounds 2 AND 3 for
    dtype reasons — this guards the SEMANTICS independently): randomized
    event streams with gaps straddling the 6-hour threshold, equal
    timestamps (event_id tiebreak), and exact-boundary gaps, checked
    against a pure-Python gap-split reference.  The >-not-≥ boundary
    rule (a gap of exactly 6 h continues the session) is exercised
    explicitly."""
    from datetime import datetime, timedelta

    from mysqldump_to_parquet_spark.operators.temporal import (
        SESSION_GAP_HOURS,
        sessionize,
    )

    rng = random.Random(13)
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(1, 7):
        t = base
        for _ in range(rng.randint(1, 25)):
            # mix sub-gap, exact-gap (stays), and super-gap (splits) steps
            step = rng.choice(
                [
                    timedelta(minutes=rng.randint(0, 90)),
                    timedelta(hours=SESSION_GAP_HOURS),  # exact: same session
                    timedelta(hours=SESSION_GAP_HOURS, microseconds=1),
                    timedelta(hours=rng.randint(7, 30)),
                ]
            )
            t = t + step
            n_at_ts = rng.choice([1, 1, 1, 2])  # sometimes equal-ts pairs
            for _ in range(n_at_ts):
                eid += 1
                rows.append(
                    (eid, t, user, "click", round(rng.uniform(0, 50), 6), "{}")
                )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        (r.user_id, r.session_id): (
            r.session_start,
            r.session_end,
            r.n_events,
            round(r.total_value, 6),
        )
        for r in sessionize(spark, str(tmp_path)).collect()
    }

    # pure-Python reference: sort by (ts, event_id), split on gap > 6 h
    want = {}
    by_user: dict = {}
    for e_id, t, user, _typ, val, _props in rows:
        by_user.setdefault(user, []).append((t, e_id, val))
    gap = timedelta(hours=SESSION_GAP_HOURS)
    for user, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        cur: list = []
        for t, e_id, val in evs:
            if prev is None or (t - prev) > gap:
                if cur:
                    want[(user, sid)] = (
                        cur[0][0],
                        cur[-1][0],
                        len(cur),
                        round(sum(v for _, _, v in cur), 6),
                    )
                sid += 1
                cur = []
            cur.append((t, e_id, val))
            prev = t
        if cur:
            want[(user, sid)] = (
                cur[0][0],
                cur[-1][0],
                len(cur),
                round(sum(v for _, _, v in cur), 6),
            )
    assert got == want


def _write_random_events(spark, tmp_path, rng, n_users=6, max_n=30):
    """Synthetic events.parquet with colliding timestamps, multi-day
    spans, and all event types the sequence operators key on."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(1, n_users + 1):
        t = base
        for _ in range(rng.randint(2, max_n)):
            t = t + timedelta(hours=rng.choice([0, 0, 1, 5, 26, 50]))
            eid += 1
            rows.append(
                (
                    eid,
                    t,
                    user,
                    rng.choice(["view", "click", "error", "purchase"]),
                    round(rng.uniform(0, 100), 6),
                    "{}",
                )
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return rows


def _sorted_seq(rows, user):
    return sorted(
        ((t, e, typ, v) for e, t, u, typ, v, _ in rows if u == user)
    )


def test_ewma_matches_python_recursion(spark, tmp_path):
    """applyInPandas EWMA ≡ the plain per-user Python recursion
    y_t = α·x_t + (1-α)·y_{t-1}, rounded to 6 in both."""
    from mysqldump_to_parquet_spark.operators.temporal import EWMA_ALPHA, ewma

    rng = random.Random(29)
    rows = _write_random_events(spark, tmp_path, rng)
    got = {
        r.event_id: r.ewma_value for r in ewma(spark, str(tmp_path)).collect()
    }
    want = {}
    for user in {u for _, _, u, _, _, _ in rows}:
        y = None
        for t, e, typ, v in _sorted_seq(rows, user):
            y = v if y is None else EWMA_ALPHA * v + (1 - EWMA_ALPHA) * y
            want[e] = round(y, 6)
    assert got.keys() == want.keys()
    for e in want:
        assert abs(got[e] - want[e]) <= 1e-6, (e, got[e], want[e])


def test_streaks_match_python_islands(spark, tmp_path):
    """Gaps-and-islands streaks ≡ a direct consecutive-day scan over the
    deduped per-user day set."""
    from datetime import timedelta

    from mysqldump_to_parquet_spark.operators.events import streaks

    rng = random.Random(31)
    rows = _write_random_events(spark, tmp_path, rng, n_users=8, max_n=40)
    got = {
        r.user_id: (r.n_active_days, r.n_streaks, r.longest_streak)
        for r in streaks(spark, str(tmp_path)).collect()
    }
    want = {}
    for user in {u for _, _, u, _, _, _ in rows}:
        days = sorted({t.date() for _, t, u, _, _, _ in rows if u == user})
        runs, cur = [], 1
        for a, b in zip(days, days[1:]):
            if (b - a) == timedelta(days=1):
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        want[user] = (len(days), len(runs), max(runs))
    assert got == want


def test_event_transitions_match_python_markov(spark, tmp_path):
    """Lead-window Markov counts ≡ per-user adjacent-pair counting in
    Python; probabilities are exact integer ratios."""
    from mysqldump_to_parquet_spark.operators.events import event_transitions

    rng = random.Random(37)
    rows = _write_random_events(spark, tmp_path, rng)
    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in event_transitions(spark, str(tmp_path)).collect()
    }
    pairs: dict = {}
    for user in {u for _, _, u, _, _, _ in rows}:
        seq = [typ for _, _, typ, _ in _sorted_seq(rows, user)]
        for a, b in zip(seq, seq[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    row_tot: dict = {}
    for (a, _b), n in pairs.items():
        row_tot[a] = row_tot.get(a, 0) + n
    want = {k: (n, n / row_tot[k[0]]) for k, n in pairs.items()}
    assert got == want


def test_match_pattern_matches_python_scan(spark, tmp_path):
    """Bounded-lookahead error→purchase matcher ≡ a Python scan of each
    user's ordered sequence (first purchase within the next 3 events)."""
    from mysqldump_to_parquet_spark.operators.events import (
        PATTERN_LOOKAHEAD,
        match_pattern,
    )

    rng = random.Random(41)
    rows = _write_random_events(spark, tmp_path, rng, n_users=10, max_n=40)
    got = {
        r.event_id: r.steps_to_purchase
        for r in match_pattern(spark, str(tmp_path)).collect()
    }
    want = {}
    for user in {u for _, _, u, _, _, _ in rows}:
        seq = _sorted_seq(rows, user)
        for i, (_t, e, typ, _v) in enumerate(seq):
            if typ != "error":
                continue
            for step in range(1, PATTERN_LOOKAHEAD + 1):
                if i + step < len(seq) and seq[i + step][2] == "purchase":
                    want[e] = step
                    break
    assert got == want


def test_conversion_latency_matches_python_scan(spark, tmp_path):
    """Carry-forward view→purchase pairing ≡ a Python scan keeping the
    most recent STRICTLY-PRECEDING view (frame ends at -1: a purchase
    sharing its timestamp row-order-after a view still pairs, but a
    purchase BEFORE any view does not); median via the same
    lower+frac·(upper−lower) interpolation."""
    from mysqldump_to_parquet_spark.operators.events import conversion_latency

    rng = random.Random(43)
    rows = _write_random_events(spark, tmp_path, rng, n_users=10, max_n=40)
    got = {
        r.user_id: (r.n_conversions, r.median_latency_s)
        for r in conversion_latency(spark, str(tmp_path)).collect()
    }
    want = {}
    for user in {u for _, _, u, _, _, _ in rows}:
        lat = []
        last_view = None
        for t, _e, typ, _v in _sorted_seq(rows, user):
            if typ == "purchase" and last_view is not None:
                lat.append(
                    int(t.timestamp() * 1e6) - int(last_view.timestamp() * 1e6)
                )
            if typ == "view":  # AFTER the purchase check: frame ends at -1
                last_view = t
        if not lat:
            continue
        lat.sort()
        n = len(lat)
        if n % 2:
            med = float(lat[n // 2])
        else:
            med = (lat[n // 2 - 1] + lat[n // 2]) / 2.0
        want[user] = (n, round(med / 1_000_000.0, 6))
    assert got == want


def test_attribution_credit_conserves_and_matches_python(spark, tmp_path):
    """Linear attribution ≡ Python: each purchase with ≥1 in-window
    touch contributes exactly 1.0 credit split equally; per-channel
    sums match and total credit equals the number of attributed
    purchases."""
    from datetime import datetime, timedelta

    from mysqldump_to_parquet_spark.operators.events import (
        ATTR_CHANNELS,
        ATTR_WINDOW_HOURS,
        attribution_channels,
    )

    rng = random.Random(47)
    base = datetime(2024, 3, 1)
    rows = []
    eid = 0
    for user in range(1, 9):
        t = base
        for _ in range(rng.randint(3, 30)):
            t = t + timedelta(minutes=rng.choice([5, 30, 200, 500]))
            eid += 1
            typ = rng.choice(["view", "click", "purchase"])
            rows.append(
                (eid, t, user, typ, 1.0, '{"k": %d}' % rng.randint(0, 11))
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        r.channel: (r.n_touches, r.n_purchases, r.credit)
        for r in attribution_channels(spark, str(tmp_path)).collect()
    }

    import json as _json

    window = timedelta(hours=ATTR_WINDOW_HOURS)
    per_channel: dict = {}
    attributed = 0
    for user in range(1, 9):
        evs = sorted((t, e, typ, props) for e, t, u, typ, _v, props in rows if u == user)
        touches = [
            (t, _json.loads(props)["k"] % ATTR_CHANNELS)
            for t, _e, typ, props in evs
            if typ in ("view", "click")
        ]
        for t, pe, typ, _props in evs:
            if typ != "purchase":
                continue
            hits = [ch for tt, ch in touches if tt <= t <= tt + window]
            if not hits:
                continue
            attributed += 1
            for ch in hits:
                n_t, pids, cr = per_channel.get(ch, (0, set(), 0.0))
                pids = set(pids) | {pe}
                per_channel[ch] = (n_t + 1, pids, cr + 1.0 / len(hits))
    want = {
        ch: (n_t, len(pids), round(cr, 6))
        for ch, (n_t, pids, cr) in per_channel.items()
    }
    assert got == want
    total_credit = sum(c for _, _, c in got.values())
    assert abs(total_credit - attributed) < 1e-4


def test_running_distinct_matches_python_prefix_sets(spark, tmp_path):
    """First-seen-flag running distinct ≡ Python prefix-set sizes over
    each type's (ts, event_id)-ordered stream."""
    from mysqldump_to_parquet_spark.operators.windows import (
        win_running_distinct,
    )

    rng = random.Random(53)
    rows = _write_random_events(spark, tmp_path, rng, n_users=12, max_n=25)
    out = win_running_distinct(spark, str(tmp_path)).collect()
    cols = set(out[0].asDict())
    assert {"event_type", "event_id"} <= cols
    got = {(r.event_type, r.event_id): r for r in out}
    by_type: dict = {}
    for e, t, u, typ, _v, _p in rows:
        by_type.setdefault(typ, []).append((t, e, u))
    run_col = next(c for c in cols if c not in ("event_type", "event_id", "ts", "user_id"))
    for typ, evs in by_type.items():
        evs.sort()
        seen: set = set()
        for t, e, u in evs:
            seen.add(u)
            assert got[(typ, e)][run_col] == len(seen), (typ, e)


def test_running_distinct_daily_agrees_with_exact(spark):
    """Day-grain scale primary ≡ the per-event exact form sampled at each
    day's last event: for every (type, day) present in the daily output,
    the exact running count at that day's final event must match — the
    two plans (groupBy pre-agg vs first-seen-flag window) are independent
    derivations of the same curve."""
    from pyspark.sql import functions as F

    from mysqldump_to_parquet_spark.operators.windows import (
        win_running_distinct,
        win_running_distinct_daily,
    )

    sf = "/root/testdata/sf0.001"
    daily = {
        (r.event_type, r.day): r.running_distinct_users
        for r in win_running_distinct_daily(spark, sf).collect()
    }
    events = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_id", F.to_date("ts").alias("day")
    )
    exact = (
        win_running_distinct(spark, sf)
        .join(events, "event_id")
        .groupBy("event_type", "day")
        .agg(F.max("running_distinct_users").alias("day_end"))
        .collect()
    )
    assert daily  # non-degenerate fixture
    # the daily output has a knot only on days with NEW users; the value
    # as of any day is the knot at the greatest daily-day ≤ it
    knots: dict = {}
    for (typ, day), v in daily.items():
        knots.setdefault(typ, []).append((day, v))
    for typ in knots:
        knots[typ].sort()
    for r in exact:
        asof = max(v for d, v in knots[r.event_type] if d <= r.day)
        assert asof == r.day_end, (r.event_type, r.day, asof, r.day_end)


def test_ab_test_matches_python_welch(spark, tmp_path):
    """Welch t + Welch–Satterthwaite dof ≡ the same formulas in Python
    on identical rounded moments; a planted mean-shifted type must be
    flagged significant and an identical-distribution pair must not."""
    from mysqldump_to_parquet_spark.operators.aggregates import ab_test

    rng = random.Random(67)
    rows = []
    eid = 0
    base = datetime(2024, 1, 1)

    def emit(typ, mu, n):
        nonlocal eid
        for _ in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    base + timedelta(seconds=eid),
                    rng.randint(1, 9),
                    typ,
                    round(rng.gauss(mu, 2.0), 6),
                    "{}",
                )
            )

    emit("aa", 10.0, 300)
    emit("bb", 10.0, 300)   # same distribution as aa
    emit("cc", 14.0, 300)   # clearly shifted
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        (r.type_a, r.type_b): (r.n_a, r.n_b, r.t_stat, r.dof, r.significant_5pct)
        for r in ab_test(spark, str(tmp_path)).collect()
    }

    import statistics

    by_type: dict = {}
    for _e, _t, _u, typ, v, _p in rows:
        by_type.setdefault(typ, []).append(v)
    want = {}
    types = sorted(by_type)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            xa, xb = by_type[ta], by_type[tb]
            na, nb = float(len(xa)), float(len(xb))
            ma = round(sum(xa) / na, 6)
            mb = round(sum(xb) / nb, 6)
            s2a = round(statistics.variance(xa), 6)
            s2b = round(statistics.variance(xb), 6)
            se = s2a / na + s2b / nb
            t = (ma - mb) / math.sqrt(se)
            dof = se * se / (
                (s2a / na) ** 2 / (na - 1) + (s2b / nb) ** 2 / (nb - 1)
            )
            want[(ta, tb)] = (
                int(na),
                int(nb),
                round(t, 6),
                round(dof, 4),
                abs(t) > 1.96,
            )
    for k in want:
        ga, wa = got[k], want[k]
        assert ga[:2] == wa[:2]
        assert abs(ga[2] - wa[2]) < 1e-5, (k, ga, wa)
        assert abs(ga[3] - wa[3]) < 1e-2
        assert ga[4] == wa[4]
    assert not got[("aa", "bb")][4]  # identical distributions: not significant
    assert got[("aa", "cc")][4] and got[("bb", "cc")][4]  # shifted: flagged


def test_agg_mode_matches_python_counter(spark, tmp_path):
    """Deterministic mode (count desc, type asc tiebreak) ≡ Python
    Counter with the same tiebreak, including planted exact ties."""
    from mysqldump_to_parquet_spark.operators.aggregates import agg_mode

    rng = random.Random(71)
    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    for user in range(1, 15):
        kinds = rng.sample(["view", "click", "error", "purchase"], k=rng.randint(1, 4))
        for _ in range(rng.randint(1, 20)):
            eid += 1
            rows.append(
                (eid, base + timedelta(seconds=eid), user, rng.choice(kinds), 1.0, "{}")
            )
    # user 99: exact tie between 'click' and 'view' -> 'click' wins (asc)
    for typ in ("view", "view", "click", "click"):
        eid += 1
        rows.append((eid, base + timedelta(seconds=eid), 99, typ, 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        r.user_id: (r.modal_type, r.modal_cnt, r.n_events)
        for r in agg_mode(spark, str(tmp_path)).collect()
    }
    from collections import Counter

    by_user: dict = {}
    for _e, _t, u, typ, _v, _p in rows:
        by_user.setdefault(u, []).append(typ)
    want = {}
    for u, typs in by_user.items():
        cnt = Counter(typs)
        typ, n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        want[u] = (typ, n, len(typs))
    assert got == want
    assert got[99][0] == "click"


def test_asof_nearest_matches_python_scan(spark, tmp_path):
    """Bidirectional nearest as-of ≡ a Python scan choosing the closest
    in-tolerance click (backward preferred on exact distance ties;
    equal-ts clicks break to the highest click_id backward / lowest
    forward, mirroring the carried-element rules)."""
    from datetime import datetime, timedelta

    from mysqldump_to_parquet_spark.operators.asof import (
        NEAREST_TOL_US,
        join_asof_nearest,
    )

    rng = random.Random(73)
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(1, 12):
        t = base
        for _ in range(rng.randint(3, 35)):
            t = t + timedelta(minutes=rng.choice([1, 30, 240, 500]))
            eid += 1
            rows.append(
                (
                    eid,
                    t,
                    user,
                    rng.choice(["purchase", "click", "view"]),
                    1.0,
                    "{}",
                )
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = join_asof_nearest(spark, str(tmp_path)).collect()
    got = {r.event_id: r.nearest_click_id for r in out}

    tol = timedelta(microseconds=NEAREST_TOL_US)
    want = {}
    for user in range(1, 12):
        evs = sorted(
            (t, e, typ) for e, t, u, typ, _v, _p in rows if u == user
        )
        clicks = [(t, e) for t, e, typ in evs if typ == "click"]
        for t, e, typ in evs:
            if typ != "purchase":
                continue
            # backward candidate: greatest ts ≤ t (tie → max id);
            # forward: least ts ≥ t (tie → min id); backward wins equal
            # distances — mirrors the two carried scans
            back = [(ct, ce) for ct, ce in clicks if ct <= t and t - ct <= tol]
            fwd = [(ct, ce) for ct, ce in clicks if ct >= t and ct - t <= tol]
            b = max(back) if back else None
            f = min(fwd) if fwd else None
            if b is not None and (f is None or (t - b[0]) <= (f[0] - t)):
                want[e] = b[1]
            elif f is not None:
                want[e] = f[1]
            else:
                want[e] = None  # unmatched purchases still emit a row
    assert got == want


def test_sim_radius_matches_bruteforce(spark, sf_dir):
    """Radius search over the fixture ≡ brute-force cosine filter in
    NumPy at the same τ and id bound."""
    import numpy as np

    from mysqldump_to_parquet_spark.llm.similarity import (
        PROBE,
        RADIUS_MAX_ID,
        RADIUS_TAU,
        sim_radius,
    )

    got = {r.vec_id: r.cosine for r in sim_radius(spark, sf_dir).collect()}

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(F.col("vec_id") < RADIUS_MAX_ID)
        .collect()
    )
    p = np.array(PROBE, dtype=np.float64)
    want = {}
    for r in rows:
        x = np.array([float(v) for v in r.embedding], dtype=np.float64)
        c = round(float(x @ p / (np.linalg.norm(x) * np.linalg.norm(p))), 6)
        if c >= RADIUS_TAU:
            want[r.vec_id] = c
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-6


def test_fn_geo_haversine_matches_python(spark, sf_dir):
    """JVM haversine ≡ math.* haversine on the same synthetic points."""
    from mysqldump_to_parquet_spark.functions.scalar import EARTH_R_KM, fn_geo

    got = {r.c_custkey: r for r in fn_geo(spark, sf_dir).collect()}
    lat0, lon0 = 48.8566, 2.3522
    rad = math.pi / 180.0
    for k, r in got.items():
        lat = ((k * 7919) % 1700) / 10.0 - 85.0
        lon = ((k * 104729) % 3600) / 10.0 - 180.0
        a = (
            math.sin((lat - lat0) * rad / 2) ** 2
            + math.cos(lat * rad)
            * math.cos(lat0 * rad)
            * math.sin((lon - lon0) * rad / 2) ** 2
        )
        d = 2 * EARTH_R_KM * math.asin(math.sqrt(a))
        assert r.lat == round(lat, 4) and r.lon == round(lon, 4)
        assert abs(r.dist_km - d) < 1e-3, (k, r.dist_km, d)
        assert 0.0 <= r.dist_km <= math.pi * EARTH_R_KM  # on-sphere bound


def test_embed_quantize_matches_numpy_reference(spark, sf_dir):
    """int8 quantization outputs ≡ an independent per-vector NumPy
    recomputation: exact scale, exact position-weighted checksum, codes
    within [-127, 127], error mean within rounding."""
    import numpy as np

    from mysqldump_to_parquet_spark.llm.vectors import (
        DIM,
        Q_LEVELS,
        embed_quantize,
    )

    out = {r.vec_id: r for r in embed_quantize(spark, sf_dir).collect()}
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200).collect()
    checked = 0
    for row in rows:
        if row.vec_id not in out:
            continue
        x = np.array([float(v) for v in row.embedding], dtype=np.float64)
        amax = np.abs(x).max()
        if amax == 0:
            continue
        scale = amax / Q_LEVELS
        y = x / scale
        q = np.trunc(y + np.copysign(0.5, y)).astype(np.int64)
        assert np.abs(q).max() <= Q_LEVELS + 1
        checksum = int((q * np.arange(1, DIM + 1, dtype=np.int64)).sum())
        err = float(np.abs(x - q * scale).sum() / DIM)
        r = out[row.vec_id]
        assert r.scale == scale, row.vec_id
        assert r.q_checksum == checksum, row.vec_id
        assert abs(r.mean_abs_err - round(err, 6)) <= 1e-6
        checked += 1
    assert checked >= 100


def test_time_rollup_grains_consistent(spark, sf_dir):
    """ROLLUP ladder invariants on the fixture: the grand-total row
    equals the table count/sum; each month row equals the sum of its
    day rows; each day row equals the sum of its hour rows; and the
    finest grain matches a direct groupBy."""
    from mysqldump_to_parquet_spark.operators.temporal import time_rollup

    rows = time_rollup(spark, sf_dir).collect()
    total = [r for r in rows if r.bucket_month is None]
    assert len(total) == 1
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    from mysqldump_to_parquet_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    n_all = ev.count()
    assert total[0].n_events == n_all

    months = {
        r.bucket_month: r.n_events
        for r in rows
        if r.bucket_month is not None and r.bucket_day is None
    }
    days = [
        r for r in rows if r.bucket_day is not None and r.bucket_hour is None
    ]
    hours = [r for r in rows if r.bucket_hour is not None]
    assert sum(months.values()) == n_all
    by_month_from_days: dict = {}
    for r in days:
        by_month_from_days[r.bucket_month] = (
            by_month_from_days.get(r.bucket_month, 0) + r.n_events
        )
    assert by_month_from_days == months
    by_day_from_hours: dict = {}
    for r in hours:
        by_day_from_hours[r.bucket_day] = (
            by_day_from_hours.get(r.bucket_day, 0) + r.n_events
        )
    assert by_day_from_hours == {r.bucket_day: r.n_events for r in days}
    # finest grain equals a direct aggregate
    direct = {
        (r.m, r.d, r.h): r.n
        for r in ev.groupBy(
            F.date_trunc("month", "ts").alias("m"),
            F.date_trunc("day", "ts").alias("d"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got_fine = {
        (r.bucket_month, r.bucket_day, r.bucket_hour): r.n_events for r in hours
    }
    assert got_fine == direct


def test_period_over_period_matches_python(spark, sf_dir):
    """Month-over-month deltas ≡ Python lag over the identical rounded
    monthly revenue series per priority."""
    from mysqldump_to_parquet_spark.operators.windows import (
        win_period_over_period,
    )
    from mysqldump_to_parquet_spark.catalog import load_table

    got = {
        (r.o_orderpriority, r.month): (r.revenue, r.mom_delta, r.mom_pct)
        for r in win_period_over_period(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders").collect()
    monthly: dict = {}
    for r in o:
        key = (r.o_orderpriority, r.o_orderdate.strftime("%Y-%m"))
        monthly[key] = monthly.get(key, 0.0) + r.o_totalprice
    monthly = {k: round(v, 4) for k, v in monthly.items()}
    by_prio: dict = {}
    for (prio, month), rev in monthly.items():
        by_prio.setdefault(prio, []).append((month, rev))
    want = {}
    for prio, series in by_prio.items():
        series.sort()
        prev = None
        for month, rev in series:
            if prev is None:
                want[(prio, month)] = (rev, None, None)
            else:
                want[(prio, month)] = (
                    rev,
                    rev - prev,
                    round((rev - prev) / prev * 100, 6),
                )
            prev = rev
    assert got.keys() == want.keys()
    for k in want:
        gr, gd, gp = got[k]
        wr, wd, wp = want[k]
        assert abs(gr - wr) < 1e-6, k
        assert (gd is None) == (wd is None) and (gp is None) == (wp is None)
        if gd is not None:
            assert abs(gd - wd) < 1e-6 and abs(gp - wp) < 1e-4, k


def test_rolling_corr_matches_python(spark, tmp_path):
    """Trailing-frame rolling autocorrelation over (user, type) series ≡
    a Python recomputation of corr(value, lag value) on each trailing
    window (rows before the 3rd of a partition are cut)."""
    import statistics

    from mysqldump_to_parquet_spark.operators.windows import (
        ROLL_CORR_ROWS,
        win_rolling_corr,
    )

    rng = random.Random(83)
    rows = _write_random_events(spark, tmp_path, rng, n_users=6, max_n=30)
    got = {
        r.event_id: r.roll_corr
        for r in win_rolling_corr(spark, str(tmp_path)).collect()
    }
    series: dict = {}
    for e, t, u, typ, v, _p in rows:
        series.setdefault((u, typ), []).append((t, e, v))
    want = {}
    for key, evs in series.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        prev = [None] + vals[:-1]
        for i, (_t, e, _v) in enumerate(evs):
            if i < 2:  # rn >= 3 cut
                continue
            lo = max(0, i - (ROLL_CORR_ROWS - 1))
            xs, ys = [], []
            for j in range(lo, i + 1):
                if prev[j] is not None:
                    xs.append(vals[j])
                    ys.append(prev[j])
            if len(xs) < 2:
                want[e] = None
                continue
            try:
                c = statistics.correlation(xs, ys)
                want[e] = round(c, 6)
            except statistics.StatisticsError:  # zero variance frame
                want[e] = None
    assert got.keys() == want.keys()
    for e in want:
        if want[e] is None or got[e] is None:
            assert got[e] == want[e], e
        else:
            assert abs(got[e] - want[e]) <= 1e-5, (e, got[e], want[e])


def test_fn_url_matches_python_urllib(spark, sf_dir):
    """parse_url extraction ≡ Python urllib.parse on the identical
    synthetic URLs (host, path, query, named params)."""
    from urllib.parse import parse_qs, urlparse

    from mysqldump_to_parquet_spark.functions.scalar import fn_url
    from mysqldump_to_parquet_spark.catalog import load_table

    docs = {
        r.doc_id: r.source
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in fn_url(spark, sf_dir).collect():
        url = (
            f"https://www.example{r.doc_id % 7}.com/articles/{r.doc_id % 50}"
            f"?page={r.doc_id % 5}&ref={docs[r.doc_id]}"
        )
        p = urlparse(url)
        q = parse_qs(p.query)
        assert r.host == p.hostname
        assert r.path == p.path
        assert r.query == p.query
        assert r.page_param == q["page"][0]
        assert r.ref_param == q["ref"][0]


def test_pii_redact_semantics(spark, sf_dir):
    """PII redaction actually redacts: re-deriving the enriched text in
    Python, the redacted md5 must equal Python's re.sub chain (same
    order: email → IP → phone), counts must match Python's findall, and
    no email/phone/IP pattern may survive redaction."""
    import hashlib
    import re

    from mysqldump_to_parquet_spark.llm.scrub import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        pii_redact,
    )
    from mysqldump_to_parquet_spark.catalog import load_table

    out = {r.doc_id: r for r in pii_redact(spark, sf_dir).collect()}

    # mirror _enriched_expr in Python against the raw fixture text
    docs = load_table(spark, sf_dir, "documents").limit(300).collect()
    checked = 0
    for d in docs:
        if d.doc_id not in out:
            continue
        raw = (
            f"contact user{d.doc_id}@mail.example.com or call "
            f"+1-555-{d.doc_id % 10000:04d} from 10.{d.doc_id % 256}."
            f"{(d.doc_id * 7) % 256}.{(d.doc_id * 13) % 256} :: {d.text}"
        )
        red = re.sub(EMAIL_RE, "<EMAIL>", raw)
        red = re.sub(IPV4_RE, "<IP>", red)
        red = re.sub(PHONE_RE, "<PHONE>", red)
        r = out[d.doc_id]
        assert r.n_emails == len(re.findall(EMAIL_RE, raw))
        assert r.n_ips == len(re.findall(IPV4_RE, raw))
        assert r.n_phones == len(re.findall(PHONE_RE, raw))
        assert r.n_emails >= 1 and r.n_ips >= 1 and r.n_phones >= 1
        assert r.redacted_md5 == hashlib.md5(red.encode()).hexdigest(), d.doc_id
        assert r.redacted_len == len(red)
        # nothing PII-shaped survives
        assert not re.search(EMAIL_RE, red)
        assert not re.search(PHONE_RE, red)
        checked += 1
    assert checked >= 100


def test_scd2_interval_invariants(spark, tmp_path):
    """SCD2 history invariants on a randomized stream: per user, exactly
    one current row; intervals chain (each valid_to equals the next
    valid_from); no overlaps; and the row set matches a Python lead."""
    from mysqldump_to_parquet_spark.operators.temporal import scd2

    rng = random.Random(103)
    rows = _write_random_events(spark, tmp_path, rng, n_users=8, max_n=25)
    out = scd2(spark, str(tmp_path)).collect()

    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    src: dict = {}
    for e, t, u, typ, _v, _p in rows:
        src.setdefault(u, []).append((t, e, typ))
    assert by_user.keys() == src.keys()
    for u, history in by_user.items():
        history.sort(key=lambda r: (r.valid_from, r.event_id))
        evs = sorted(src[u])
        assert len(history) == len(evs)
        currents = [r for r in history if r.is_current]
        assert len(currents) == 1
        assert currents[0].valid_to is None
        for cur, nxt in zip(history, history[1:]):
            assert cur.valid_to == nxt.valid_from  # chained, no gaps
        for r, (t, e, typ) in zip(history, evs):
            assert (r.valid_from, r.event_id, r.state) == (t, e, typ)


def test_cohort_retention_invariants(spark, sf_dir):
    """Retention-triangle invariants on the fixture: every cohort has a
    week-0 row (everyone is active in their own first week), later-week
    active counts never exceed the cohort's week-0 size, week offsets
    are non-negative, and week-0 sizes sum to the distinct-user count
    (each user belongs to exactly one cohort)."""
    from mysqldump_to_parquet_spark.operators.events import cohort_retention
    from mysqldump_to_parquet_spark.catalog import load_table

    rows = cohort_retention(spark, sf_dir).collect()
    assert rows
    size0 = {
        r.cohort_week: r.n_active for r in rows if r.week_no == 0
    }
    cohorts = {r.cohort_week for r in rows}
    assert cohorts == set(size0)  # every cohort has its week-0 row
    for r in rows:
        assert r.week_no >= 0
        assert 0 < r.n_active <= size0[r.cohort_week]
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(size0.values()) == n_users


def test_resample_locf_matches_python(spark, tmp_path):
    """Hourly LOCF grid ≡ Python: complete hour coverage from each
    user's first to last event hour, zero-filled counts, carried
    forward rounded sums."""
    from mysqldump_to_parquet_spark.streaming.windows import resample_locf

    rng = random.Random(107)
    rows = _write_random_events(spark, tmp_path, rng, n_users=5, max_n=15)
    got = {
        (r.user_id, r.bucket): (r.n_events, r.value_locf)
        for r in resample_locf(spark, str(tmp_path)).collect()
    }

    from datetime import timedelta

    def floor_h(t):
        return t.replace(minute=0, second=0, microsecond=0)

    by_user: dict = {}
    for _e, t, u, _typ, v, _p in rows:
        by_user.setdefault(u, []).append((t, v))
    want = {}
    for u, evs in by_user.items():
        per_bucket: dict = {}
        for t, v in evs:
            b = floor_h(t)
            n, s = per_bucket.get(b, (0, 0.0))
            per_bucket[b] = (n + 1, s + v)
        t0 = floor_h(min(t for t, _ in evs))
        t1 = floor_h(max(t for t, _ in evs))
        carried = None
        b = t0
        while b <= t1:
            if b in per_bucket:
                n, s = per_bucket[b]
                carried = round(s, 6)
                want[(u, b)] = (n, carried)
            else:
                want[(u, b)] = (0, carried)
            b = b + timedelta(hours=1)
    assert got.keys() == want.keys()
    for k in want:
        gn, gv = got[k]
        wn, wv = want[k]
        assert gn == wn, k
        if wv is None:
            assert gv is None
        else:
            assert abs(gv - wv) <= 1e-6, k


def test_ngram_lm_matches_python_counter(spark, tmp_path):
    """Top-K bigram MLE ≡ Python Counter with the identical ordering and
    exact conditional probabilities."""
    import random as _random
    from collections import Counter

    from mysqldump_to_parquet_spark.llm.terms import NGRAM_TOP_K, ngram_lm

    # reuse the documents-fixture writer from the curation test module
    from tests.test_curation_ops import _write_documents

    rng = _random.Random(109)
    vocab = [f"v{i}" for i in range(8)]
    docs = [
        (" ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40))), "s0")
        for _ in range(25)
    ]
    sf = _write_documents(spark, tmp_path, docs)

    got = [
        (r.w1, r.w2, r.pair_cnt, r.first_cnt, r.p_cond)
        for r in ngram_lm(spark, sf).collect()
    ]
    pairs: Counter = Counter()
    for text, _ in docs:
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] += 1
    firsts: Counter = Counter()
    for (a, _b), n in pairs.items():
        firsts[a] += n
    want = sorted(
        (
            (a, b, n, firsts[a], n / firsts[a])
            for (a, b), n in pairs.items()
        ),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:NGRAM_TOP_K]
    assert got == want


def test_knn_classify_matches_numpy_vote(spark, sf_dir):
    """K-NN label vote ≡ NumPy: identical K-cut (rounded cosine desc,
    vec_id asc) and per-label votes/best-cosine."""
    import numpy as np

    from mysqldump_to_parquet_spark.llm.vectors import KNN_K
    from mysqldump_to_parquet_spark.llm.similarity import PROBE
    from mysqldump_to_parquet_spark.llm.vectors import knn_classify

    got = [
        (r.label, r.votes, r.best_cosine)
        for r in knn_classify(spark, sf_dir).collect()
    ]
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    p = np.array(PROBE, dtype=np.float64)
    scored = []
    for r in rows:
        x = np.array([float(v) for v in r.embedding], dtype=np.float64)
        c = round(float(x @ p / (np.linalg.norm(x) * np.linalg.norm(p))), 6)
        scored.append((-c, r.vec_id, r.label, c))
    scored.sort()
    top = scored[:KNN_K]
    votes: dict = {}
    for _negc, _vid, label, c in top:
        n, best = votes.get(label, (0, -2.0))
        votes[label] = (n + 1, max(best, c))
    want = sorted(
        ((lab, n, best) for lab, (n, best) in votes.items()),
        key=lambda r: (-r[1], r[0]),
    )
    assert [(l, v) for l, v, _ in got] == [(l, v) for l, v, _ in want]
    for (gl, _gv, gb), (_wl, _wv, wb) in zip(got, want):
        assert abs(gb - wb) <= 1e-6, gl


def test_dedup_embedding_matches_numpy_top1(spark, sf_dir):
    """Exact top-1 neighbor per query ≡ NumPy brute force with the same
    (cosine desc, cand_id asc) tiebreak."""
    import numpy as np

    from mysqldump_to_parquet_spark.llm.dedup import dedup_embedding

    got = {
        r.query_id: (r.nearest_id, r.cosine)
        for r in dedup_embedding(spark, sf_dir).collect()
    }
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    X = {
        r.vec_id: np.array([float(v) for v in r.embedding], dtype=np.float64)
        for r in rows
    }
    norms = {k: np.linalg.norm(v) for k, v in X.items()}
    for qid in [k for k in X if k < 30]:
        best = None
        for cid, cv in X.items():
            if cid == qid:
                continue
            c = float(X[qid] @ cv / (norms[qid] * norms[cid]))
            if best is None or (-c, cid) < best[0]:
                best = ((-c, cid), cid, c)
        assert got[qid][0] == best[1], qid
        assert abs(got[qid][1] - round(best[2], 6)) <= 1e-6, qid


def test_text_clean_semantics(spark, sf_dir):
    """Cleaning ≡ Python re chain on the raw text (URL → EMAIL →
    whitespace collapse → trim), with chars_removed / was_modified
    consistency."""
    import re

    from mysqldump_to_parquet_spark.llm.textstats import (
        RE_EMAIL,
        RE_MULTISPACE,
        RE_URL,
        text_clean,
    )
    from mysqldump_to_parquet_spark.catalog import load_table

    raw = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").limit(300).collect()
    }
    checked = 0
    for r in text_clean(spark, sf_dir).collect():
        if r.doc_id not in raw:
            continue
        t = raw[r.doc_id]
        want = re.sub(RE_URL, "<URL>", t)
        want = re.sub(RE_EMAIL, "<EMAIL>", want)
        want = re.sub(RE_MULTISPACE, " ", want).strip()
        assert r.clean_text == want, r.doc_id
        assert r.chars_removed == len(t) - len(want)
        assert r.was_modified == (want != t)
        checked += 1
    assert checked >= 100


def test_funnel_matches_python_strict_order(spark, tmp_path):
    """Strictly-ordered funnel ≡ a Python per-user scan: stage n's entry
    is the first matching event strictly after stage n-1's entry; a
    planted out-of-order user counts only up to where the order breaks,
    and an equal-timestamp stage-2 event does NOT advance (strict >)."""
    from datetime import datetime, timedelta

    from mysqldump_to_parquet_spark.operators.events import (
        FUNNEL_STAGES,
        funnel,
    )

    rng = random.Random(113)
    base = datetime(2024, 5, 1)
    rows = []
    eid = 0

    def emit(user, seq):
        nonlocal eid
        t = base
        for typ, dt in seq:
            t = t + timedelta(minutes=dt)
            eid += 1
            rows.append((eid, t, user, typ, 1.0, "{}"))

    a, b, c = FUNNEL_STAGES
    emit(1, [(a, 1), (b, 1), (c, 1)])          # full conversion
    emit(2, [(a, 1), (b, 1)])                  # stops at stage 2
    emit(3, [(b, 1), (a, 1), (c, 1)])          # out of order: b before a
    emit(4, [(a, 1), (c, 1)])                  # skips stage 2
    emit(5, [(a, 1), (b, 0), (c, 1)])          # equal-ts b: strict > blocks
    for u in range(6, 12):                     # random noise users
        emit(u, [(rng.choice([a, b, c]), rng.randint(1, 9)) for _ in range(5)])
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    r = funnel(spark, str(tmp_path)).collect()[0]

    by_user: dict = {}
    for e, t, u, typ, _v, _p in rows:
        by_user.setdefault(u, []).append((t, e, typ))
    n = [0, 0, 0]
    for u, evs in by_user.items():
        evs.sort()
        entry = None
        for stage_i, stage in enumerate((a, b, c)):
            nxt = min(
                (t for t, _e, typ in evs
                 if typ == stage and (entry is None or t > entry)),
                default=None,
            )
            if nxt is None:
                break
            entry = nxt
            n[stage_i] += 1
    assert (r.n_stage1, r.n_stage2, r.n_stage3) == tuple(n)
    assert r.conv_1_2 == n[1] / n[0] and r.conv_2_3 == n[2] / n[1]
