"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the
same parquet, then compares row count, column names, and values
(order-insensitive; EXACT for every type, floats included — the
driver's gate hashes raw values with no rounding tolerance, so any
last-place float drift that would pass a tolerant compare still fails
the driver.  Queries must therefore round/cast identically on both
engines; this gate exists to catch the ones that don't before the
driver does).

Usage: python tools/verify_local.py [--sampled] [--subproc] [sf_dir] [query ...]

``--sampled`` (replica-scale runs): two queries — embedding_near_dup
and cluster_semantic_dedup — have corpus-QUADRATIC full oracles
(all-pairs / within-cluster cosine) that cannot finish at the 10x
replica's 200k vectors.  With the flag, each gets a BOUNDED oracle
instead: a deterministic 1-in-stride subset of vectors is recomputed
against the WHOLE corpus per-row in SQL — so both presence of reported
pairs/statuses and absence of unreported ones (recall) are checked on
that slice.  Cost: O(|subset| * n), not O(n^2).
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(rows: list[tuple], cols: list[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(row[i] for i in order))
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))


def dtype_kind_mismatch(sdf, pdf) -> list[str]:
    """Driver-lens dtype probe: the driver materializes the DuckDB oracle
    through pandas, where HUGEINT (any integer ``sum()``) exports as
    float64 while Spark emits int64 — numerically equal values that
    hash differently (``2978`` vs ``2978.0``).  ``fetchall()`` hides
    this (HUGEINT -> Python int), which is how ``status_conditional_agg``
    stayed locally green through three red driver rounds.  Compare the
    pandas dtype *kind* per column against the Spark schema; flag any
    int-vs-float disagreement on a null-free column (nullable int
    columns legitimately export as float64, so nulls are excused).
    """
    spark_kind = {}
    for f in sdf.schema.fields:
        t = f.dataType.typeName()
        if t in ("byte", "short", "integer", "long"):
            spark_kind[f.name] = "i"
        elif t in ("float", "double"):
            spark_kind[f.name] = "f"
    bad = []
    for col in pdf.columns:
        sk = spark_kind.get(col)
        dk = pdf[col].dtype.kind
        if sk is None or dk not in "iuf":
            continue
        if (sk == "i") != (dk in "iu") and not pdf[col].isna().any():
            bad.append(f"{col}: spark={'int' if sk == 'i' else 'float'} duckdb-pandas={pdf[col].dtype}")
    return bad


def values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact: the driver hashes with no tolerance
    return a == b


def _near_dup_sampled(con, stride: int):
    """Bounded oracle for embedding_near_dup: every pair touching the
    1-in-stride vector subset, recomputed per-row against the whole
    corpus. Returns (sql, spark_row_filter)."""
    sql = f"""
WITH sub AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings WHERE vec_id % {stride} = 0),
all_v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
hits AS (
  SELECT LEAST(s.vec_id, a.vec_id) AS id_1,
         GREATEST(s.vec_id, a.vec_id) AS id_2,
         round(list_cosine_similarity(s.v, a.v), 4) AS cosine
  FROM sub s JOIN all_v a ON s.vec_id <> a.vec_id
  WHERE list_cosine_similarity(s.v, a.v) >= 0.45
)
SELECT DISTINCT id_1, id_2, cosine FROM hits
"""

    def keep(row_dict):
        return row_dict["id_1"] % stride == 0 or row_dict["id_2"] % stride == 0

    return sql, keep


def _semantic_sampled(con, stride: int):
    """Bounded oracle for cluster_semantic_dedup: assignment AND
    dup-status recomputed for the 1-in-stride subset — each sampled
    vector scanned against its whole cluster (the quadratic part
    confined to |subset| * cluster_size)."""
    sql = f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
mix1 AS (
  SELECT vec_id, v,
         (xor(vec_id & 2147483647, (vec_id & 2147483647) >> 16) * 73244475) & 2147483647 AS h1
  FROM emb
),
mix2 AS (
  SELECT vec_id, v, (xor(h1, h1 >> 16) * 73244475) & 2147483647 AS h2 FROM mix1
),
picked AS (
  SELECT vec_id, v,
         row_number() OVER (ORDER BY xor(h2, h2 >> 16), vec_id) AS pick
  FROM mix2
),
centroids AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS list_id, v AS cvec
  FROM picked WHERE pick <= 8
),
assign AS (
  SELECT e.vec_id, e.v, c.list_id,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.list_id) AS r
  FROM emb e CROSS JOIN centroids c
),
assignments AS (SELECT vec_id, v, list_id FROM assign WHERE r = 1),
sub AS (SELECT * FROM assignments WHERE vec_id % {stride} = 0)
SELECT s.vec_id,
       CAST(s.list_id AS BIGINT) AS list_id,
       CASE WHEN EXISTS (
              SELECT 1 FROM assignments b
              WHERE b.list_id = s.list_id AND b.vec_id < s.vec_id
                AND list_cosine_similarity(b.v, s.v) >= 0.4)
            THEN 'semantic_dup' ELSE 'kept' END AS status
FROM sub s
"""

    def keep(row_dict):
        return row_dict["vec_id"] % stride == 0

    return sql, keep


SAMPLED = {
    "embedding_near_dup": _near_dup_sampled,
    "cluster_semantic_dedup": _semantic_sampled,
}




_SUBPROC_ORACLE = """
import pickle, sys, os
import duckdb
sql_path, sf_dir, out_path, tables = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4].split(",")
os.makedirs("/tmp/duckdb_verify_spill", exist_ok=True)
con = duckdb.connect()
con.execute("SET memory_limit='24GiB'")
con.execute("SET temp_directory='/tmp/duckdb_verify_spill'")
for t in tables:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
sql = open(sql_path).read()
res = con.execute(sql)
cols = [d[0] for d in res.description]
rows = res.fetchall()
pdf = con.execute(sql).df()
with open(out_path, "wb") as f:
    pickle.dump({"cols": cols, "rows": rows, "pdf": pdf}, f)
"""


def oracle_in_subprocess(sql: str, sf_dir: str, tables) -> tuple:
    """Last-resort oracle replay in a CLEAN child process: co-resident
    with the Spark JVM, the long-lived in-process DuckDB hits
    budget/commit OOMs on the heaviest replica replays that the same
    SQL survives easily in a fresh process (measured: 11-42s
    standalone vs bad-alloc in-process)."""
    import pickle
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".sql", delete=False) as f:
        f.write(sql)
        sql_path = f.name
    out_path = sql_path + ".out"
    cmd = [sys.executable, "-c", _SUBPROC_ORACLE, sql_path, sf_dir, out_path,
           ",".join(tables)]
    # start_new_session: the child must NOT share the driver's process
    # group — Spark/py4j signal traffic SIGINTs the group mid-replay
    # and killed the heaviest child deterministically
    try:
        subprocess.run(cmd, check=True, timeout=1800, start_new_session=True)
    except subprocess.CalledProcessError:
        # transient commit-pressure crash while the Spark side of the
        # same query still holds memory — settle and retry once
        import time as _time

        _time.sleep(10)
        subprocess.run(cmd, check=True, timeout=1800, start_new_session=True)
    with open(out_path, "rb") as f:
        d = pickle.load(f)
    return d["cols"], d["rows"], d["pdf"]


def main() -> int:
    args = sys.argv[1:]
    sampled_mode = "--sampled" in args
    if sampled_mode:
        args.remove("--sampled")
    subproc_mode = "--subproc" in args
    if subproc_mode:
        args.remove("--subproc")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from palegislature_spark.catalog import STAR_TABLES
    from palegislature_spark.session import get_spark

    spark = get_spark("verify_local")
    import os.path

    def fresh_con():
        # Co-resident with the Spark JVM, DuckDB's default limit (80%
        # of RAM) intermittently throws bad-alloc OOM on the heavier
        # replays (replica-scale BPE) even with system RAM free —
        # allocator interaction, not true exhaustion; the same SQL
        # runs fine in a pure-DuckDB process. An explicit cap with
        # spill helps but does not fully suppress it, so queries that
        # hit OutOfMemoryException retry once on a FRESH connection
        # (resets the allocator arena).
        import os

        # DuckDB does NOT create the temp_directory; if it is missing,
        # spill silently fails and budget-bound replays die with
        # KB-sized bad-allocs (the r6 replica-gate failure mode — the
        # dir evaporated with /tmp between rounds)
        os.makedirs("/tmp/duckdb_verify_spill", exist_ok=True)
        c = duckdb.connect()
        # two distinct OOM modes to thread between: the replica BPE
        # replays legitimately need >16GiB of DuckDB budget (KB-sized
        # bad-allocs fire when the QUERY budget is exhausted on an
        # unspillable block), while the kernel overcommit heuristic
        # caps total committed address space at ~50% of RAM shared
        # with the Spark JVM. 28GiB + spill + capped threads fits
        # both; the retry below absorbs residual flakes.
        c.execute("SET memory_limit='28GiB'")
        c.execute("SET threads=16")
        c.execute("SET temp_directory='/tmp/duckdb_verify_spill'")
        for t in STAR_TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                # Spark-written datasets are DIRECTORIES of part files
                # (e.g. the scalegen_star 10x replica) — glob them
                p = f"{p}/*.parquet"
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c

    con = fresh_con()

    qs, oracles = queries(), oracle_sql()
    failures = []
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if con is None:  # a prior retry died mid-reconnect
            con = fresh_con()
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(s_rows)} rows) [{time.time()-t0:.1f}s]")
            continue
        oracle_sql_text = oracles[name]
        tag = ""
        if sampled_mode and name in SAMPLED:
            n_vec = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
            stride = max(1, n_vec // 300)
            oracle_sql_text, keep = SAMPLED[name](con, stride)
            full = len(s_rows)
            s_rows = [
                r for r in s_rows if keep(dict(zip(s_cols, r)))
            ]
            tag = f" [sampled 1/{stride}: {len(s_rows)}/{full} spark rows]"
        try:
            try:
                if subproc_mode:
                    # replica-scale co-residency with the JVM makes the
                    # long-lived in-process DuckDB not just OOM but
                    # hard-ABORT (std::terminate in a destructor after
                    # bad_alloc) on the heaviest replays — run every
                    # replay in its own clean process there
                    raise duckdb.OutOfMemoryException("routed to subprocess")
                res = con.execute(oracle_sql_text)
                d_cols = [d[0] for d in res.description]
                d_rows = res.fetchall()
                d_pdf = con.execute(oracle_sql_text).df()
            except duckdb.OutOfMemoryException:
                # co-resident budget/commit OOM — rebuild the
                # connection (never leave `con` dead: that poisoned
                # every later query with ConnectionException), then
                # fall back to a CLEAN subprocess replay, which
                # reliably survives the replays the shared process
                # cannot.
                if not subproc_mode:
                    try:
                        con.close()
                    except Exception:  # noqa: BLE001
                        pass
                    import gc

                    gc.collect()
                    time.sleep(2)
                    con = None
                    con = fresh_con()
                d_cols, d_rows, d_pdf = oracle_in_subprocess(
                    oracle_sql_text, sf_dir, STAR_TABLES
                )
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue

        dt_bad = dtype_kind_mismatch(sdf, d_pdf)
        if dt_bad:
            failures.append(name)
            print(f"FAIL  {name}: driver-lens dtype mismatch: {'; '.join(dt_bad)}")
            continue

        sc, sr = normalize(s_rows, s_cols)
        dc, dr = normalize(d_rows, d_cols)
        if sc != dc:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sc} duckdb={dc}")
            continue
        if len(sr) != len(dr):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(sr)} duckdb={len(dr)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if not all(values_equal(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            failures.append(name)
            print(f"FAIL  {name}: value mismatch at sorted row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            continue
        print(f"ok    {name}: {len(sr)} rows match{tag} [{time.time()-t0:.1f}s]")

    print(f"\n{n_checked - len(failures)}/{n_checked} checked queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
