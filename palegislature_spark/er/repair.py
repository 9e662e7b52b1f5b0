"""Rule-based repair — the ``apply_edits.py`` rulebook as data (Q3).

Three rule families, each a small DataFrame joined against the fact
tables (never per-row lookups):

  * service add/remove by (year, chamber, last[, first])
    (``apply_edits.py:12-53``); the add path back-fills district and
    party from the same member's year±1 row (J9 temporal-neighbor);
  * vote-name renames, global or time-windowed
    (``apply_edits.py:54-73``) — the windowed form is an interval
    join (J8) on ``stamp > start AND stamp < stop`` (strict, matching
    the reference's SQL);
  * member field renames keyed by any source-system id
    (``apply_edits.py:74-88``).

Every function is a pure transformation returning the repaired
DataFrame (plus, for service rules, a report of rules that could not
be applied — the reference's warning prints, as data). Rule sets are
tiny; every rule join is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from palegislature_spark.er.members import ID_FIELDS, NAME_FIELDS


def apply_service_rules(
    service: DataFrame, members: DataFrame, rules: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """rules: (year int, chamber int, last str, first str|null,
    action 'remove'|'add'). Returns (service', report).

    remove: drop the member's (year, chamber) service rows when the
    rule matches exactly one member (``apply_edits.py:25-31``);
    add: when the rule matches no existing service, copy district and
    party from the single same-last, same-chamber service row in
    year±1 (``apply_edits.py:33-53`` — note the add path keys on last
    only, :37-38); ambiguous or unmatched rules land in the report.
    """
    svc = service.join(
        members.select(F.col("id").alias("member_id"), "first", "last"), "member_id"
    )
    r = F.broadcast(
        rules.select(
            F.col("year").alias("r_year"),
            F.col("chamber").alias("r_chamber"),
            F.col("last").alias("r_last"),
            F.col("first").alias("r_first"),
            "action",
        )
    )
    rule_keys = ["r_year", "r_chamber", "r_last", "r_first", "action"]

    matches = svc.join(
        r,
        (F.col("last") == F.col("r_last"))
        & (F.col("chamber") == F.col("r_chamber"))
        & (F.col("year") == F.col("r_year"))
        & (F.col("r_first").isNull() | (F.col("first") == F.col("r_first"))),
    )
    match_counts = matches.groupBy(*rule_keys).agg(
        F.countDistinct("member_id").alias("n_members"),
        F.min("member_id").alias("the_member"),
    )

    # --- removals: exactly one matching member -> drop those rows ---
    removable = match_counts.filter(
        (F.col("action") == "remove") & (F.col("n_members") == 1)
    )
    to_remove = F.broadcast(
        removable.select(
            F.col("the_member").alias("member_id"),
            F.col("r_year").alias("year"),
            F.col("r_chamber").alias("chamber"),
        )
    )
    kept = service.join(to_remove, ["member_id", "year", "chamber"], "left_anti")

    # --- additions: rule matched nothing -> neighbor-year back-fill --
    unmatched_adds = r.filter(F.col("action") == "add").join(
        match_counts.select(*rule_keys), rule_keys, "left_anti"
    )
    neighbors = svc.join(
        F.broadcast(unmatched_adds),
        (F.col("last") == F.col("r_last"))
        & (F.col("chamber") == F.col("r_chamber"))
        & (
            (F.col("year") == F.col("r_year") - 1)
            | (F.col("year") == F.col("r_year") + 1)
        ),
    )
    add_counts = neighbors.groupBy("r_year", "r_chamber", "r_last", "r_first").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.min(F.struct("year", "member_id", "district", "party")).alias("pick"),
    )
    new_rows = add_counts.filter("n_neighbors = 1").select(
        F.col("pick.member_id").alias("member_id"),
        F.col("r_year").alias("year"),
        F.col("r_chamber").alias("chamber"),
        F.col("pick.district").alias("district"),
        F.col("pick.party").alias("party"),
    )

    repaired = kept.unionByName(new_rows)
    report = (
        match_counts.filter((F.col("action") == "remove") & (F.col("n_members") != 1))
        .select(F.lit("too_many_matches").alias("issue"), *rule_keys)
        .unionByName(
            add_counts.filter("n_neighbors != 1").select(
                F.lit("ambiguous_neighbor").alias("issue"),
                "r_year",
                "r_chamber",
                "r_last",
                "r_first",
                F.lit("add").alias("action"),
            )
        )
    )
    return repaired, report


def apply_vote_renames(
    votes: DataFrame, roll_calls: DataFrame, rules: DataFrame
) -> DataFrame:
    """rules: (before str, after str, start timestamp|null,
    stop timestamp|null). NULL window = global rename
    (``apply_edits.py:57-62``); windowed renames apply where
    ``stamp > start AND stamp < stop`` strictly (``apply_edits.py:66``).
    Overlapping-rule ties resolve to the earliest-start rule,
    deterministically (the reference applies rules in YAML order;
    edits.yaml windows never overlap for one name).
    """
    stamps = roll_calls.select(F.col("id").alias("roll_id"), "stamp")
    v = votes.withColumn("__row", F.monotonically_increasing_id()).join(
        stamps, "roll_id", "left"
    )
    r = F.broadcast(
        rules.select(
            F.col("before").alias("r_before"),
            F.col("after").alias("r_after"),
            F.col("start").alias("r_start"),
            F.col("stop").alias("r_stop"),
        )
    )
    joined = v.join(
        r,
        (F.col("name") == F.col("r_before"))
        & (
            F.col("r_start").isNull()
            | ((F.col("stamp") > F.col("r_start")) & (F.col("stamp") < F.col("r_stop")))
        ),
        "left",
    )
    # a vote row must come out exactly once even if two rules hit it
    w = Window.partitionBy("__row").orderBy(F.col("r_start").asc_nulls_first())
    return (
        joined.withColumn("__pick", F.row_number().over(w))
        .filter("__pick = 1")
        .select(
            "session_id",
            "roll_id",
            F.coalesce("r_after", "name").alias("name"),
            "vote",
            "member_id",
        )
    )


def apply_member_renames(members: DataFrame, rules: DataFrame) -> DataFrame:
    """rules: (key_field str in ID_FIELDS, key_value long, first,
    middle, last, suffix — non-null fields overwrite).
    ``apply_edits.py:74-88`` / ``edits.yaml:148-154``.
    """
    out = members
    non_name = [c for c in members.columns if c not in NAME_FIELDS]
    for key_field in ID_FIELDS:
        r = F.broadcast(
            rules.filter(F.col("key_field") == key_field).select(
                F.col("key_value").alias("__kv"),
                *[F.col(n).alias(f"__new_{n}") for n in NAME_FIELDS],
            )
        )
        out = (
            out.join(r, out[key_field] == F.col("__kv"), "left")
            .select(
                *non_name,
                *[
                    F.coalesce(F.col(f"__new_{n}"), F.col(n)).alias(n)
                    for n in NAME_FIELDS
                ],
            )
            .select(members.columns)
        )
    return out
