"""Generate an N-times replica of a testdata scale-factor directory.

Usage::

    python tools/scalegen_star.py [SRC_SF_DIR] [OUT_DIR] [N]
    # defaults: /root/testdata/sf0.1  /tmp/sparkgraft_sf1  10

Purpose: the driver ships sf0.001/0.01/0.1; the 100 TB claims need at
least one measured growth step, so this synthesizes an sf1-shaped
dataset from sf0.1 and `bench.py` runs against it unchanged
(``SPARK_GRAFT_SF_DIR=/tmp/sparkgraft_sf1 python bench.py``). Results
are tracked in BASELINE.md ("Scale-up check: full headline suite").

Replication preserves WORKLOAD SHAPE, not just row count — naive
concatenation would change the statistics the operators are sensitive
to:

* every key domain (custkey, orderkey, partkey, suppkey, event ids,
  user ids, doc ids, vec ids) is offset per copy by ``max_key + 1``,
  so join fan-outs, group cardinalities and per-key densities stay at
  their sf0.1 values while table sizes grow N-times — exactly how a
  bigger TPC-H scale factor grows;
* region/nation stay fixed (true dimensions — scale factor never grows
  them in TPC-H either);
* document text gets a per-copy vocabulary (non-stopword tokens
  suffixed with the copy index) — verbatim copies would add
  C(N,2) * docs cross-copy exact-duplicate pairs, exploding the dedup
  WORKLOAD quadratically (that is output growth, not engine cost;
  BASELINE.md discusses the distinction). Stopwords are left intact so
  quality-gate ratios and language-ID profiles are unchanged per copy;
* embeddings get a tiny deterministic first-dimension offset per copy
  (k * 1e-3) so nearest-neighbour results don't degenerate into
  N-way exact ties while distances stay effectively unchanged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from palegislature_spark.catalog import load
from palegislature_spark.pipelines.curate import STOPWORDS

# key columns to offset per copy, keyed by their domain table
KEY_DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

# table -> {column: key domain}
TABLE_KEYS = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def _salted_text(k: int) -> F.Column:
    """Per-copy vocabulary: suffix non-stopword tokens with the copy
    index. One transform over the split array — JVM-side, no UDF."""
    tk = F.split(F.col("text"), " ")
    return F.array_join(
        F.transform(
            tk,
            lambda w: F.when(w.isin(*STOPWORDS) | (w == ""), w).otherwise(
                F.concat(w, F.lit(str(k)))
            ),
        ),
        " ",
    )


def replicate(
    spark: SparkSession, src: str, out: str, n: int
) -> None:
    spaces = {
        dom: load(spark, src, t).agg(F.max(c)).collect()[0][0] + 1
        for dom, (t, c) in KEY_DOMAINS.items()
    }

    for t in ("region", "nation"):
        load(spark, src, t).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )

    for t, keys in TABLE_KEYS.items():
        base = load(spark, src, t)
        copies: list[DataFrame] = []
        for k in range(n):
            c = base
            for col, dom in keys.items():
                c = c.withColumn(col, F.col(col) + F.lit(k * spaces[dom]))
            if t == "documents" and k > 0:
                c = c.withColumn("text", _salted_text(k))
            if t == "embeddings" and k > 0:
                c = c.withColumn(
                    "embedding",
                    F.concat(
                        F.array(
                            (
                                F.element_at("embedding", 1) + F.lit(k * 1e-3)
                            ).cast("float")
                        ),
                        F.slice(
                            "embedding", 2, F.size("embedding") - F.lit(1)
                        ),
                    ),
                )
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
        print(f"{t}: {n}x written", flush=True)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from palegislature_spark.session import get_spark

    replicate(get_spark("scalegen_star"), src, out, n)
    print(f"wrote {n}x replica of {src} to {out}")


if __name__ == "__main__":
    main()
