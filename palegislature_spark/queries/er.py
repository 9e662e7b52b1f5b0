"""ER registry queries (SURVEY §2.9, §2.3 J5-J7, §2.1 S7): run the
entity-resolution operators over the inline snowflake fixture with
DuckDB oracles that restate the same semantics in SQL.

The driver's star tables carry no name-shaped data, so these queries
ignore ``sf_dir`` and materialize the fixture inline on both engines
(Spark createDataFrame / DuckDB VALUES) — the oracle still recomputes
the result from first principles, it is not a pasted expectation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from palegislature_spark.er import (
    apply_service_rules,
    apply_vote_renames,
    connected_components,
    match_vote_names,
    merge_members,
)
from palegislature_spark.queries import er_fixtures as fx
from palegislature_spark.queries.registry import register
from palegislature_spark.sources.merge import merge_by_key

# ---------------------------------------------------------------------------
# J5: blocked fuzzy name match (two passes)
# ---------------------------------------------------------------------------

_NAME_MATCH_ORACLE = f"""
WITH votes AS (SELECT * FROM {fx.values_sql('votes')}),
roll_calls AS (SELECT * FROM {fx.values_sql('roll_calls')}),
session_days AS (SELECT * FROM {fx.values_sql('session_days')}),
members AS (SELECT * FROM {fx.values_sql('members')}),
service AS (SELECT * FROM {fx.values_sql('service')}),
nicks AS (SELECT * FROM {fx.nicks_sql()}),
years AS (
  SELECT r.id AS roll_id,
         COALESCE(year(r.stamp), year(d.date)) AS year,
         r.chamber
  FROM roll_calls r LEFT JOIN session_days d ON r.day_id = d.id
),
vnames AS (
  SELECT DISTINCT y.year, y.chamber, v.name,
    CASE WHEN v.name LIKE '%,%'
         THEN lower(trim(split_part(v.name, ',', 1)))
         ELSE lower(v.name) END AS blk,
    CASE WHEN v.name LIKE '%,%'
         THEN lower(split_part(trim(split_part(v.name, ',', 2)), ' ', 1))
         ELSE NULL END AS first_raw
  FROM votes v JOIN years y ON v.roll_id = y.roll_id
),
vparsed AS (
  SELECT year, chamber, name, blk,
    CASE WHEN length(first_raw) = 2 AND substr(first_raw, 2, 1) = '.'
         THEN substr(first_raw, 1, 1) ELSE first_raw END AS vfirst
  FROM vnames
),
roster AS (
  SELECT DISTINCT s.year, s.chamber, m.id AS member_id,
         lower(m.first) AS mfirst, lower(m.last) AS blk,
         upper(m.last) AS last_upper
  FROM service s JOIN members m ON s.member_id = m.id
),
block_sizes AS (
  SELECT year, chamber, blk, count(*) AS block_n
  FROM roster GROUP BY year, chamber, blk
),
cand AS (
  SELECT v.year, v.chamber, v.name, r.member_id, b.block_n, v.vfirst
  FROM vparsed v
  JOIN roster r ON v.year = r.year AND v.chamber = r.chamber AND v.blk = r.blk
  JOIN block_sizes b ON v.year = b.year AND v.chamber = b.chamber AND v.blk = b.blk
  WHERE (v.vfirst IS NULL AND b.block_n = 1)
     OR v.vfirst = r.mfirst
     OR EXISTS (SELECT 1 FROM nicks n
                WHERE (n.nick = v.vfirst AND n.formal = r.mfirst)
                   OR (n.nick = r.mfirst AND n.formal = v.vfirst))
     OR (substr(v.vfirst, 1, 1) = substr(r.mfirst, 1, 1)
         AND length(v.vfirst) = 1 AND length(r.mfirst) > 1)
),
pass1 AS (
  SELECT year, chamber, name, min(member_id) AS member_id,
         'block' AS method
  FROM cand GROUP BY year, chamber, name HAVING count(*) = 1
),
un_names AS (
  SELECT v.year, v.chamber, v.name FROM vparsed v
  LEFT JOIN pass1 p ON v.year = p.year AND v.chamber = p.chamber AND v.name = p.name
  WHERE p.name IS NULL
),
un_members AS (
  SELECT r.year, r.chamber, r.member_id, r.last_upper FROM roster r
  LEFT JOIN pass1 p ON r.year = p.year AND r.chamber = p.chamber
                    AND r.member_id = p.member_id
  WHERE p.member_id IS NULL
),
sub_cand AS (
  SELECT n.year, n.chamber, n.name, m.member_id
  FROM un_names n
  JOIN un_members m ON n.year = m.year AND n.chamber = m.chamber
  WHERE position(n.name IN m.last_upper) > 0
),
sub_per_name AS (
  SELECT year, chamber, name, min(member_id) AS member_id
  FROM sub_cand GROUP BY year, chamber, name HAVING count(*) = 1
),
pass2 AS (
  SELECT year, chamber, min(name) AS name, member_id, 'substring' AS method
  FROM sub_per_name GROUP BY year, chamber, member_id HAVING count(*) = 1
)
SELECT name, CAST(member_id AS BIGINT) AS member_id, method FROM pass1
UNION ALL
SELECT name, CAST(member_id AS BIGINT) AS member_id, method FROM pass2
"""


@register(
    "er_blocked_name_match",
    covers=(
        "J5,J6,Q1 (match_names.py:13-47 blocked fuzzy match; :140-156 "
        "substring fixpoint; names.py:96-149 is_same_name)"
    ),
    oracle=_NAME_MATCH_ORACLE,
)
def er_blocked_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass vote-name resolution over the inline fixture."""
    snow = fx.snowflake(spark)
    out = match_vote_names(
        snow["votes"],
        snow["roll_calls"],
        snow["session_days"],
        snow["members"],
        snow["service"],
    )
    return out.select("name", "member_id", "method")


# ---------------------------------------------------------------------------
# Q2: connected components (recursive-CTE oracle)
# ---------------------------------------------------------------------------

_EDGES = [(1, 2), (2, 3), (3, 4), (6, 5), (7, 7), (9, 8)]
_EDGE_VALUES = ", ".join(f"({a}, {b})" for a, b in _EDGES)

_CC_ORACLE = f"""
WITH RECURSIVE raw(a, b) AS (VALUES {_EDGE_VALUES}),
edges AS (SELECT a, b FROM raw UNION SELECT b, a FROM raw),
verts AS (SELECT DISTINCT a FROM edges),
reach(a, b) AS (
  SELECT a, a FROM verts
  UNION
  SELECT e.a, r.b FROM edges e JOIN reach r ON e.b = r.a
)
SELECT CAST(a AS BIGINT) AS id, CAST(min(b) AS BIGINT) AS component
FROM reach GROUP BY a
"""


@register(
    "er_connected_components",
    covers="Q2 (find_duplicates.py:69-110 merge groups, generalized to transitive components)",
    oracle=_CC_ORACLE,
)
def er_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = spark.createDataFrame(_EDGES, "id_1 long, id_2 long")
    return connected_components(edges)


# ---------------------------------------------------------------------------
# Q2: member dedup end-to-end (merge map)
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = f"""
WITH members AS (SELECT * FROM {fx.values_sql('members')}),
service AS (SELECT * FROM {fx.values_sql('service')}),
svc_blocks AS (
  SELECT DISTINCT s.year, s.chamber, lower(m.last) AS blk, m.id,
         lower(m.first) AS f, m.house_archive_id, m.house_current_id,
         m.senate_archive_id, m.senate_current_id
  FROM service s JOIN members m ON s.member_id = m.id
),
pairs AS (
  SELECT a.id AS id_1, b.id AS id_2
  FROM svc_blocks a JOIN svc_blocks b
    ON a.year = b.year AND a.chamber = b.chamber AND a.blk = b.blk
   AND a.id < b.id
  WHERE (a.f = b.f
         OR (substr(a.f,1,1) = substr(b.f,1,1)
             AND ((length(a.f) = 1 AND length(b.f) > 1)
               OR (length(b.f) = 1 AND length(a.f) > 1)
               OR (length(a.f) = 2 AND substr(a.f,2,1) = '.' AND length(b.f) > 2)
               OR (length(b.f) = 2 AND substr(b.f,2,1) = '.' AND length(a.f) > 2))))
    AND NOT (a.house_archive_id IS NOT NULL AND b.house_archive_id IS NOT NULL)
    AND NOT (a.house_current_id IS NOT NULL AND b.house_current_id IS NOT NULL)
    AND NOT (a.senate_archive_id IS NOT NULL AND b.senate_archive_id IS NOT NULL)
    AND NOT (a.senate_current_id IS NOT NULL AND b.senate_current_id IS NOT NULL)
)
SELECT CAST(id_2 AS BIGINT) AS id, CAST(id_1 AS BIGINT) AS survivor_id FROM pairs
"""


@register(
    "er_dedup_members",
    covers="J7,Q2 (find_duplicates.py:49-66 blocked self-join; :69-110 merge)",
    oracle=_DEDUP_ORACLE,
)
def er_dedup_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    snow = fx.snowflake(spark)
    _, _, merge_map = merge_members(snow["members"], snow["service"])
    return merge_map


# ---------------------------------------------------------------------------
# Q3/J8: vote renames (global + windowed interval join)
# ---------------------------------------------------------------------------

_RENAME_RULES = [
    ("SMITH, TOM", "SMITH", None, None),
    ("BRANEKY", "KRUEGER", "2019-06-01 00:00:00", "2019-06-02 00:00:00"),
    ("BRANEKY", "IGNORED", "2020-01-01 00:00:00", "2020-12-31 00:00:00"),
]
_RENAME_VALUES = ", ".join(
    "("
    + ", ".join(
        "CAST(NULL AS TIMESTAMP)" if v is None else (f"TIMESTAMP '{v}'" if i >= 2 else f"'{v}'")
        for i, v in enumerate(r)
    )
    + ")"
    for r in _RENAME_RULES
)

_RENAME_ORACLE = f"""
WITH votes AS (SELECT * FROM {fx.values_sql('votes')}),
roll_calls AS (SELECT * FROM {fx.values_sql('roll_calls')}),
rules AS (SELECT * FROM (VALUES {_RENAME_VALUES}) AS rules(before, after, start, stop)),
hits AS (
  SELECT v.session_id, v.roll_id, v.name, v.vote, v.member_id,
         r.after, r.start,
         row_number() OVER (
           PARTITION BY v.session_id, v.roll_id, v.name, v.vote
           ORDER BY r.start ASC NULLS FIRST
         ) AS pick
  FROM votes v
  JOIN roll_calls rc ON v.roll_id = rc.id
  LEFT JOIN rules r ON v.name = r.before
    AND (r.start IS NULL OR (rc.stamp > r.start AND rc.stamp < r.stop))
)
SELECT CAST(session_id AS BIGINT) AS session_id,
       CAST(roll_id AS BIGINT) AS roll_id,
       COALESCE(after, name) AS name,
       CAST(vote AS INTEGER) AS vote,
       CAST(member_id AS BIGINT) AS member_id
FROM hits WHERE pick = 1
"""


@register(
    "er_vote_renames",
    covers="Q3,J8,S8 (apply_edits.py:54-73 global + interval-windowed renames)",
    oracle=_RENAME_ORACLE,
)
def er_vote_renames(spark: SparkSession, sf_dir: str) -> DataFrame:
    snow = fx.snowflake(spark)
    rules = spark.createDataFrame(
        _RENAME_RULES, "before string, after string, start string, stop string"
    ).select(
        "before",
        "after",
        F.col("start").cast("timestamp"),
        F.col("stop").cast("timestamp"),
    )
    return apply_vote_renames(snow["votes"], snow["roll_calls"], rules)


# ---------------------------------------------------------------------------
# Q3/J9: service add/remove with year+-1 back-fill
# ---------------------------------------------------------------------------

_SVC_RULES = [
    (2020, 1, "White", None, "add"),  # no 2020 White row -> copy from 2019
    (2019, 1, "Krueger-Braneky", None, "remove"),
]
_SVC_RULE_VALUES = ", ".join(
    "({}, {}, '{}', {}, '{}')".format(
        r[0], r[1], r[2], "CAST(NULL AS VARCHAR)" if r[3] is None else f"'{r[3]}'", r[4]
    )
    for r in _SVC_RULES
)

_SVC_ORACLE = f"""
WITH members AS (SELECT * FROM {fx.values_sql('members')}),
service AS (SELECT * FROM {fx.values_sql('service')}),
rules AS (SELECT * FROM (VALUES {_SVC_RULE_VALUES})
          AS rules(r_year, r_chamber, r_last, r_first, action)),
svc AS (
  SELECT s.*, m.first, m.last FROM service s
  JOIN members m ON s.member_id = m.id
),
matches AS (
  SELECT r.*, s.member_id FROM rules r
  JOIN svc s ON s.last = r.r_last AND s.chamber = r.r_chamber
            AND s.year = r.r_year
            AND (r.r_first IS NULL OR s.first = r.r_first)
),
match_counts AS (
  SELECT r_year, r_chamber, r_last, r_first, action,
         count(DISTINCT member_id) AS n_members,
         min(member_id) AS the_member
  FROM matches GROUP BY 1, 2, 3, 4, 5
),
removals AS (
  SELECT the_member AS member_id, r_year AS year, r_chamber AS chamber
  FROM match_counts WHERE action = 'remove' AND n_members = 1
),
kept AS (
  SELECT s.* FROM service s
  WHERE NOT EXISTS (SELECT 1 FROM removals r
                    WHERE r.member_id = s.member_id
                      AND r.year = s.year AND r.chamber = s.chamber)
),
unmatched_adds AS (
  SELECT r.* FROM rules r
  WHERE r.action = 'add' AND NOT EXISTS (
    SELECT 1 FROM match_counts m
    WHERE m.r_year = r.r_year AND m.r_chamber = r.r_chamber
      AND m.r_last = r.r_last
      AND (m.r_first = r.r_first OR (m.r_first IS NULL AND r.r_first IS NULL))
      AND m.action = r.action)
),
neighbors AS (
  SELECT r.r_year, r.r_chamber, r.r_last, r.r_first,
         s.year, s.member_id, s.district, s.party
  FROM svc s JOIN unmatched_adds r
    ON s.last = r.r_last AND s.chamber = r.r_chamber
   AND (s.year = r.r_year - 1 OR s.year = r.r_year + 1)
),
add_counts AS (
  SELECT r_year, r_chamber, r_last, r_first, count(*) AS n,
         min(member_id) AS member_id, min(district) AS district,
         min(party) AS party
  FROM neighbors GROUP BY 1, 2, 3, 4
),
new_rows AS (
  SELECT member_id, r_year AS year, r_chamber AS chamber, district, party
  FROM add_counts WHERE n = 1
)
SELECT CAST(member_id AS BIGINT) AS member_id, CAST(year AS INTEGER) AS year,
       CAST(chamber AS INTEGER) AS chamber, CAST(district AS INTEGER) AS district,
       party
FROM kept
UNION ALL
SELECT CAST(member_id AS BIGINT), CAST(year AS INTEGER), CAST(chamber AS INTEGER),
       CAST(district AS INTEGER), party
FROM new_rows
"""


@register(
    "er_service_backfill",
    covers="Q3,J9 (apply_edits.py:12-53 service rules; year+-1 temporal-neighbor join)",
    oracle=_SVC_ORACLE,
)
def er_service_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    snow = fx.snowflake(spark)
    rules = spark.createDataFrame(
        _SVC_RULES, "year int, chamber int, last string, first string, action string"
    )
    repaired, _report = apply_service_rules(snow["service"], snow["members"], rules)
    return repaired


# ---------------------------------------------------------------------------
# Q4: crawl-status accounting
# ---------------------------------------------------------------------------

_STATUS_ORACLE = f"""
WITH sessions AS (SELECT * FROM {fx.values_sql('sessions')}),
session_days AS (SELECT * FROM {fx.values_sql('session_days')}),
roll_calls AS (SELECT * FROM {fx.values_sql('roll_calls')}),
days AS (
  SELECT d.id AS day_id, s.year, s.chamber, d.last_crawl
  FROM session_days d JOIN sessions s ON d.session_id = s.id
),
day_stats AS (
  SELECT year, chamber, count(*) AS day_total,
         sum(CASE WHEN last_crawl IS NOT NULL THEN 1 ELSE 0 END) AS day_crawled
  FROM days GROUP BY year, chamber
),
roll_stats AS (
  SELECT d.year, d.chamber, count(*) AS roll_total,
         sum(CASE WHEN r.last_crawl IS NOT NULL THEN 1 ELSE 0 END) AS roll_crawled
  FROM roll_calls r JOIN days d ON r.day_id = d.day_id
  GROUP BY d.year, d.chamber
),
joined AS (
  SELECT d.year, d.chamber, d.day_total, d.day_crawled,
         COALESCE(r.roll_total, 0) AS roll_total,
         COALESCE(r.roll_crawled, 0) AS roll_crawled
  FROM day_stats d LEFT JOIN roll_stats r
    ON d.year = r.year AND d.chamber = r.chamber
)
SELECT CAST(year AS INTEGER) AS year, CAST(chamber AS INTEGER) AS chamber,
       CAST(day_total AS BIGINT) AS day_total,
       CAST(day_crawled AS BIGINT) AS day_crawled,
       CAST(roll_total AS BIGINT) AS roll_total,
       CAST(roll_crawled AS BIGINT) AS roll_crawled,
       CASE WHEN day_total = 0 OR roll_total = 0 THEN NULL
            WHEN day_total = day_crawled THEN
              CASE WHEN roll_total = roll_crawled THEN 'complete'
                   ELSE 'rolls missing' END
            ELSE 'days missing' END AS status
FROM joined
"""


@register(
    "crawl_status_gate",
    covers="Q4,A3,A4 (pa_legislature.py:51-93 crawl statuses; dump.py:15-31 gate)",
    oracle=_STATUS_ORACLE,
)
def crawl_status_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from palegislature_spark.pipelines import crawl_statuses

    snow = fx.snowflake(spark)
    return crawl_statuses(snow["sessions"], snow["session_days"], snow["roll_calls"])


# ---------------------------------------------------------------------------
# S7: merge-by-key upsert semantics
# ---------------------------------------------------------------------------

_EXISTING = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
_UPDATES = [(2, "B", 21.0), (4, "d", 40.0), (4, "d2", 41.0)]

_MERGE_ORACLE = """
WITH existing AS (SELECT * FROM (VALUES (1, 'a', 10.0), (2, 'b', 20.0), (3, 'c', 30.0))
                  AS existing(id, v, x)),
updates AS (SELECT * FROM (VALUES (2, 'B', 21.0), (4, 'd', 40.0), (4, 'd2', 41.0))
            AS updates(id, v, x)),
unioned AS (
  SELECT id, v, x, 0 AS src FROM existing
  UNION ALL
  SELECT id, v, x, 1 AS src FROM updates
),
ranked AS (
  SELECT id, v, x, row_number() OVER (PARTITION BY id ORDER BY src DESC, x DESC) AS rn
  FROM unioned
)
SELECT CAST(id AS BIGINT) AS id, v, CAST(x AS DOUBLE) AS x FROM ranked WHERE rn = 1
"""


@register(
    "batch_merge_upsert",
    covers="S7,S8 (crawl.py:77,112,166,206 db.update upsert -> merge-by-key batch write)",
    oracle=_MERGE_ORACLE,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing = spark.createDataFrame(_EXISTING, "id long, v string, x double")
    updates = spark.createDataFrame(_UPDATES, "id long, v string, x double")
    return merge_by_key(existing, updates, ["id"], version_col="x")
