"""Capture .explain('formatted') for headline queries into plans/r12/.

Usage: python tools/capture_plans.py <suffix> [name1 name2 ...]

Writes plans/r12/<query>_<suffix>.txt for every requested query (the
full bench HEADLINE + EXTRA set when no names are given).  The suffix
is 'before'/'after' per the optimization-round deliverable contract.
Plan capture runs the query builder (some builders collect constant-
sized model literals — codebooks, centroid picks — so a few Spark jobs
fire) but never executes the main action.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    only = sys.argv[2:]

    import bench
    from palegislature_spark.queries import REGISTRY
    from palegislature_spark.session import get_spark

    spark = get_spark("capture_plans")
    base = os.path.basename(SF_DIR.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)

    names = only or (bench.HEADLINE + sorted(bench.EXTRA))
    for name in names:
        if name in REGISTRY:
            df = REGISTRY[name].fn(spark, SF_DIR)
        elif name in bench.EXTRA:
            df = bench.EXTRA[name](spark, SF_DIR, sf)
        else:
            print(f"skip {name}: unknown")
            continue
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        n_exch = text.count("Exchange")
        n_py = sum(
            text.count(t)
            for t in ("BatchEvalPython", "ArrowEvalPython")
        )
        print(
            f"{name}: exchanges={n_exch} pythonEval={n_py} "
            f"sortMerge={text.count('SortMergeJoin')} "
            f"bhj={text.count('BroadcastHashJoin')} -> {path}"
        )


if __name__ == "__main__":
    main()
