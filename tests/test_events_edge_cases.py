"""Differential edge-corpus for EVENTS-table queries: hand-built events
with SAME-MILLISECOND ties (sub-ms order deliberately opposite event_id
order), exact session/gap boundaries, same-ms as-of matches, and NULL
values — written as TIMESTAMP(NANOS) parquet exactly like the driver's
testdata.  These are the shapes random data never produces, where the
cross-engine ordering rule (epoch_ms, event_id) is load-bearing."""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

B = 1_700_000_000_000  # ms epoch base
MS = 1_000_000  # ns per ms

# (event_id, ts_ns, user_id, event_type, value, props)
EDGE_EVENTS = [
    # user 1: same-ms tie where ns order (11 before 10) is OPPOSITE to
    # event_id order — the cross-engine ordering hazard
    (10, B * MS + 900_000, 1, "click", 1.0, None),
    (11, B * MS + 200_000, 1, "view", 7.0, "p"),
    # user 1: w4 boundary — exactly 30 min after the tie ms: NO split (>)
    (12, (B + 1_800_000) * MS, 1, "click", 20.0, "p"),
    # user 1: and one past the boundary: split
    (13, (B + 3_600_001) * MS, 1, "error", 2.0, None),
    # user 2: w5 boundary — exactly 2 h apart merges, 2 h + 1 ms splits
    (20, B * MS, 2, "view", 5.0, None),
    (21, (B + 7_200_000) * MS, 2, "view", 5.5, None),
    (22, (B + 14_400_001) * MS, 2, "view", 4.9, None),
    # user 3: signup → purchase (j5 delivered, w2 latency)
    (30, B * MS, 3, "signup", 0.0, None),
    (31, (B + 1_000) * MS + 400_000, 3, "purchase", 9.99, "x"),
    # user 4: signup only → j5 timeout alert
    (40, (B + 5_000) * MS, 4, "signup", 0.0, None),
    # user 5: click and purchase in the SAME ms → inclusive as-of match
    (50, B * MS + 400_000, 5, "click", 3.0, None),
    (51, B * MS + 800_000, 5, "purchase", 30.0, None),
    # user 6: purchase with NO prior click → null as-of columns
    (60, (B + 60_000) * MS, 6, "purchase", 12.0, None),
    # user 7: error burst inside one minute (j7 incident window)
    (70, (B + 120_000) * MS, 7, "error", 1.0, None),
    (71, (B + 120_500) * MS, 7, "error", 1.5, None),
    (72, (B + 121_000) * MS, 7, "error", 2.5, None),
    (73, (B + 150_000) * MS, 7, "view", 8.0, None),
    # NULL value row
    (80, (B + 200_000) * MS, 8, "view", None, None),
    # user 9: w8 funnel deadlines — click EXACTLY 1 h after first view
    # (inclusive <= keeps it), purchase exactly 1 h + 1 ms after first
    # click (excluded from w8, still counted by unconstrained w7)
    (90, (B + 300_000) * MS, 9, "view", 1.0, None),
    (91, (B + 300_000 + 3_600_000) * MS, 9, "click", 1.0, None),
    (92, (B + 300_000 + 7_200_001) * MS, 9, "purchase", 1.0, None),
]

EVENT_QUERIES = [
    "p2_filter_inequality",
    "p3_filter_eq_single_col",
    "p5_time_threshold",
    "p6_branching_threshold",
    "p7_null_as_status",
    "p8_membership_sets",
    "j5_timeout_pairing",
    "j6_asof_join",
    "j7_range_join",
    "a2_groupby_count",
    "a4_group_stats",
    "a6_running_counters",
    "a8_rollup_counts",
    "a9_distinct_aggs",
    "a10_pivot_counts",
    "a11_grouping_sets",
    "s8_set_operations",
    "srt1_topn_by_time",
    "smp1_deterministic_sample",
    "u3_snapshot_last_event_wins",
    "u4_heartbeat_rollup",
    "w1_hourly_event_counts",
    "w2_latency_quantiles",
    "w3_event_gaps",
    "w4_sessionization",
    "w5_session_window",
    # funnel: user 1's view/click share one ms -> strict '>' excludes it;
    # retention: day-offset floor-div boundary on the same-ms ties
    "w6_retention_cohorts",
    "w7_funnel",
    "w8_funnel_windowed",
    "w9_scd2_intervals",
    "f8_weighted_classify",
]


def _normalize(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.6g}")
            elif isinstance(v, bool):
                vals.append(str(v).lower())
            elif v is None:
                vals.append("\0null")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events-edge")
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in EDGE_EVENTS], pa.int64()),
            "ts": pa.array([r[1] for r in EDGE_EVENTS], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in EDGE_EVENTS], pa.int64()),
            "event_type": pa.array([r[3] for r in EDGE_EVENTS], pa.string()),
            "value": pa.array([r[4] for r in EDGE_EVENTS], pa.float64()),
            "props": pa.array([r[5] for r in EDGE_EVENTS], pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_events_edge_corpus_matches_oracle(spark, edge_dir, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, edge_dir)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{edge_dir}/events.parquet'")
    rel = con.execute(oracles[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()

    assert sorted(sdf.columns) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row counts differ"
    assert _normalize(srows, sdf.columns) == _normalize(orows, ocols), f"{name}: values"


def test_edge_asof_same_ms_is_inclusive(spark, edge_dir):
    """The same-ms click/purchase pair must match (inclusive at-or-before)."""
    rows = {r.purchase_id: r for r in entrymod.queries()["j6_asof_join"](spark, edge_dir).collect()}
    assert rows[51].click_id == 50 and rows[51].ms_since_click == 0
    assert rows[60].click_id is None


def test_edge_funnel_deadline_boundary(spark, edge_dir):
    """w8's per-step deadline is INCLUSIVE: user 9's click exactly 1 h
    after the first view survives the window, while the purchase 1 ms
    past the click deadline drops only from w8 — never from w7."""
    qs = entrymod.queries()
    w7 = qs["w7_funnel"](spark, edge_dir).first()
    w8 = qs["w8_funnel_windowed"](spark, edge_dir).first()
    assert w8.n_viewed == w7.n_viewed
    assert w8.n_clicked_within_window == w7.n_clicked_after_view
    assert w8.n_purchased_within_window == w7.n_purchased_after_click - 1


def test_edge_scd2_current_slice_equals_snapshot(spark, edge_dir):
    """w9's is_current=1 slice must be exactly u3's last-event-wins
    snapshot (same (epoch_ms, event_id) tie rule), and intervals must
    chain gaplessly per user: each valid_to equals the next valid_from."""
    qs = entrymod.queries()
    scd2 = qs["w9_scd2_intervals"](spark, edge_dir).collect()
    snap = {
        (r.user_id, r.last_event_id) for r in qs["u3_snapshot_last_event_wins"](spark, edge_dir).collect()
    }
    current = {(r.user_id, r.event_id) for r in scd2 if r.is_current == 1}
    assert current == snap
    by_user = {}
    for r in scd2:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.valid_from_ms, r.event_id))
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to_ms == b.valid_from_ms
        assert rows[-1].valid_to_ms is None
