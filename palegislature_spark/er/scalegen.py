"""Synthetic vote-name corpus for the ER scale benchmark.

Generates the BASELINE.md "Scale-up check" shape (N members serving
every year in one chamber, R rolls per (year, chamber), one vote per
member per roll) entirely with ``spark.range`` + Column expressions —
distributed, deterministic, no driver-side lists — so the signature
ER capability (match_vote_names + backfill, ``match_names.py``) has a
tracked per-round perf row at any scale.

Name dirtiness mirrors the experiment: ~5 members share each surname
within a chamber (the shared-surname block case), most vote names are
"LAST, FIRST" spellings that pass-1 resolves, and every 50th member
votes under the bare surname — unresolvable in a multi-member block
by pass 1, exercising the pass-2 substring residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIRSTS = [
    "Alice", "Brian", "Carol", "David", "Ellen", "Frank", "Grace", "Henry",
    "Irene", "James", "Karen", "Louis", "Maria", "Nancy", "Oscar", "Peter",
    "Quinn", "Rosa", "Steve", "Tina", "Ulric", "Vera", "Walt", "Xena",
    "Yves", "Zoe", "Adam", "Beth", "Carl", "Dana", "Earl", "Fay",
    "Gene", "Hope", "Ivan", "June", "Kyle", "Lena", "Mark", "Nora",
]


def synthetic_vote_corpus(
    spark: SparkSession,
    n_members: int = 500,
    n_years: int = 25,
    rolls_per_group: int = 40,
    members_per_block: int = 5,
    base_year: int = 1990,
) -> dict[str, DataFrame]:
    """Returns {members, service, roll_calls, session_days, votes}.

    Row counts: votes = n_members * n_years * rolls_per_group;
    distinct (year, chamber, name) ~= n_members * n_years — the
    cardinality that actually drives match cost (BASELINE.md).
    """
    firsts = F.array(*[F.lit(x) for x in FIRSTS])

    base = spark.range(n_members).select(
        F.col("id"),
        ((F.col("id") % 2) + 1).cast("int").alias("chamber"),
        F.floor(F.col("id") / 2).alias("k"),
    )
    members = base.select(
        "id",
        "chamber",
        F.element_at(firsts, (F.col("k") % len(FIRSTS) + 1).cast("int")).alias(
            "first"
        ),
        F.lit(None).cast("string").alias("middle"),
        F.format_string(
            "Sur%04d", F.floor(F.col("k") / members_per_block).cast("int")
        ).alias("last"),
        F.lit(None).cast("string").alias("suffix"),
        # every 50th member votes under the bare surname
        (F.col("id") % 50 == 0).alias("bare_name"),
    )

    years = spark.range(n_years).select(
        (F.lit(base_year) + F.col("id")).cast("int").alias("year")
    )
    service = (
        members.select(F.col("id").alias("member_id"), "chamber")
        .crossJoin(F.broadcast(years))
        .select(
            "member_id",
            "year",
            "chamber",
            F.lit(1).cast("int").alias("district"),
            F.lit("Independent").alias("party"),
        )
    )

    n_groups = n_years * 2
    roll_calls = spark.range(n_groups * rolls_per_group).select(
        F.col("id"),
        F.lit(None).cast("long").alias("day_id"),
        F.expr(
            f"make_timestamp({base_year} + CAST(id / (2 * {rolls_per_group}) AS INT),"
            " 1, 1, 12, 0, 0)"
        ).alias("stamp"),
        (F.floor(F.col("id") / rolls_per_group) % 2 + 1).cast("int").alias("chamber"),
    )

    session_days = spark.createDataFrame([], "id long, date date")

    # one vote per member per roll of the member's chamber
    v = spark.range(n_members * n_years * rolls_per_group).select(
        (F.col("id") % n_members).alias("m"),
        (F.floor(F.col("id") / n_members) % n_years).alias("y"),
        F.floor(F.col("id") / (n_members * n_years)).alias("r"),
    )
    votes = (
        v.join(
            F.broadcast(
                members.select(
                    F.col("id").alias("m"), "chamber", "first", "last", "bare_name"
                )
            ),
            "m",
        )
        .select(
            F.lit(0).cast("long").alias("session_id"),
            (
                (F.col("y") * 2 + (F.col("chamber") - 1)) * rolls_per_group
                + F.col("r")
            ).alias("roll_id"),
            F.when(F.col("bare_name"), F.upper("last"))
            .otherwise(
                F.concat(F.upper("last"), F.lit(", "), F.upper("first"))
            )
            .alias("name"),
            (F.col("m") % 4 + 1).cast("int").alias("vote"),
            F.lit(None).cast("long").alias("member_id"),
        )
    )
    return {
        "members": members.drop("bare_name"),
        "service": service,
        "roll_calls": roll_calls,
        "session_days": session_days,
        "votes": votes,
    }
