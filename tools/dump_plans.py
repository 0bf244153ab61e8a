"""Dump ``explain("formatted")`` for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> <query> [query ...]

The optimization-round evidence trail (guide §1): every plan claim in
OPTIMIZATION_r*.md is backed by a committed before/after plan file the
judge can diff without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from fresco_hpc_spark.session import get_spark

    spark = get_spark("fresco-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
