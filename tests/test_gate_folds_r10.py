"""Pins for the round-10 gate folds (VERDICT r9 #5/#7).

The driver gate corpus carries no PII-shaped strings, so the
`q_text_stats` pii columns gate cross-engine agreement on zeros there;
this test pins the Spark/DuckDB PII mirror on an ADVERSARIAL fixture
with real matches (the same standard as the r10 mixture-key mirror
test), plus boundary cases where Java-regex and RE2 semantics could
plausibly diverge (\\b boundaries, dotted hosts, digit runs).
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_spatial_spark.operators.text import PII_PATTERNS, pii_counts

FIXTURE = [
    ("plain text no pii at all", 0, 0),
    ("reach me at a.b-c_d%e+f@sub.example.co right now", 1, 0),
    ("two mails: x@y.io and z@w.org.", 2, 0),
    ("server 10.0.255.3 fell over, peer 192.168.1.1 took over", 0, 2),
    # no \b exists inside the digit run, so 1234.5.6.7 matches nothing
    # (in BOTH engines) while 1.2.3.4 matches normally
    ("not-an-ip 1234.5.6.7 but 1.2.3.4 is", 0, 1),
    ("version v1.2.3.4suffix has no boundary", 0, 0),
    ("mail@host.com from 8.8.8.8", 1, 1),
    ("almost@an@email fails, x@y.z fails (1-char tld)", 0, 0),
    ("", 0, 0),
]


def test_pii_counts_spark_matches_duckdb_mirror(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(FIXTURE)], "id int, text string"
    )
    got = {
        r.id: (r.c.email, r.c.ipv4)
        for r in df.select("id", pii_counts("text", ("email", "ipv4")).alias("c")).collect()
    }
    # expected counts hold on the Spark side...
    for i, (t, ne, ni) in enumerate(FIXTURE):
        assert got[i] == (ne, ni), (i, t, got[i])
    # ...and the DuckDB mirror (the exact expression the q_text_stats
    # oracle uses) agrees on every row
    pq = str(tmp_path / "pii.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    email = PII_PATTERNS["email"].replace("'", "''")
    ipv4 = PII_PATTERNS["ipv4"].replace("'", "''")
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT id, len(regexp_extract_all(text, '{email}')),
               len(regexp_extract_all(text, '{ipv4}'))
        FROM read_parquet('{pq}/*.parquet') ORDER BY id
        """
    ).fetchall()
    for i, e, p in rows:
        assert (e, p) == got[i], (i, FIXTURE[i][0], (e, p), got[i])


def test_phone_ssn_cross_engine_without_lookaround(spark):
    """r11 (VERDICT r10 #6): phone/ssn counters are oracle-gated via the
    split-boundary construction — RE2 still rejects the LOOKAROUND
    patterns (pinned, so redact_pii's patterns can never silently leak
    into the oracle), but the counts use the lookaround-free cores and
    BOTH engines agree on every adversarial digit-run fixture. Semantics
    note: a digit-soup run that decomposes exactly into adjacent PII
    spans ('555-12-3456777-88-9999') counts them (raw non-overlapping
    scan + digit-edge filter), where a pure-lookaround scan would reject
    both — counts and redact_pii may differ on that class by design."""
    con = duckdb.connect()
    for kind in ("phone", "ssn"):
        pat = PII_PATTERNS[kind].replace("'", "''")
        with pytest.raises(duckdb.Error):
            con.execute(f"SELECT regexp_extract_all('x', '{pat}')")

    from datafusion_spatial_spark.operators.text import PII_CORES

    FIXTURE = [
        ("call 415-555-2671 or SSN 123-45-6789", 1, 1),
        ("digits 1123-45-67890 must NOT match ssn", 0, 0),  # r10 \b class
        ("123-45-6789", 0, 1),
        ("123-45-6789 123-45-6789", 0, 2),          # adjacent, 1-char gap
        ("x123-45-6789-1y", 0, 1),                  # dash edges are fine
        ("1234.5.6.7", 0, 0),                       # the r10 digit-run class
        ("+1 415 555 2671 and (415) 555-2671 and 14155552671", 2, 0),
        ("9415-555-2671 trailing 415-555-26715", 1, 0),  # cc eats the 9
        ("+12 (415) 555.2671ok? +12(415) 555.2671", 2, 0),
        ("", 0, 0),
        ("no pii here", 0, 0),
        ("555-12-3456777-88-9999", 0, 2),           # digit-soup class
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(FIXTURE)], "id int, text string"
    )
    got = {
        r.id: (r.c.phone, r.c.ssn)
        for r in df.select(
            "id", pii_counts("text", ("phone", "ssn")).alias("c")
        ).collect()
    }
    for i, (t, np_, ns) in enumerate(FIXTURE):
        assert got[i] == (np_, ns), (i, t, got[i])

    def bcount(t, core):
        return con.execute(
            """
            SELECT CASE WHEN len(s) <= 1 THEN 0 ELSE
              len(list_filter(range(1, len(s)), i ->
                NOT regexp_matches(s[i], '[0-9]$')
                AND NOT regexp_matches(s[i+1], '^[0-9]'))) END
            FROM (SELECT regexp_split_to_array(?, ?) AS s)
            """,
            [t, core],
        ).fetchone()[0]

    for i, (t, _, _) in enumerate(FIXTURE):
        duck = (bcount(t, PII_CORES["phone"]), bcount(t, PII_CORES["ssn"]))
        assert duck == got[i], (i, t, duck, got[i])


def test_repetition_gate_columns_signal(spark):
    """The q_text_stats dup-fraction columns must carry non-trivial signal
    on a repetitive document (guarding against a silently-constant gate
    column)."""
    from datafusion_spatial_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x\ny\nx\nz"), (3, "all unique words here")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(df, "text", "doc_id").collect()}
    assert out[1].dup_2gram_frac > 0.5
    assert abs(out[2].dup_line_frac - 0.25) < 1e-12
    assert out[3].dup_2gram_frac == 0.0


# heavy battery file: certification tier only (r15 tiering, VERDICT r14 #9)
pytestmark = pytest.mark.slow
