#!/usr/bin/env python
"""Isolation harness for the r12 optimization round.

Usage: python plans/r12/prof.py <qname_prefix>[,<qname_prefix>...] \
           [--sf /root/testdata/sf0.1] [--runs 2] [--explain-only] \
           [--tag before|after]

For each named query: one untimed warm run (codegen + page cache), then
`--runs` timed runs of freshly-built plans through the noop sink (the
guide §1.4 methodology — identical to bench.py's steady-state block),
plus `.explain("formatted")` captured to plans/r12/<q>_<tag>.txt.
Prints one line per query: best / all runs.
"""
from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--tag", default=None)
    ap.add_argument("--explain-only", action="store_true")
    args = ap.parse_args()

    from alt_spark.queries import all_queries
    from alt_spark.session import get_session

    spark = get_session("alt_spark-prof")
    queries = all_queries()
    wanted = []
    for pref in args.names.split(","):
        hits = [n for n in sorted(queries) if n.startswith(pref)]
        if not hits:
            print(f"no query matches {pref!r}", file=sys.stderr)
            return 1
        wanted.extend(hits)

    outdir = os.path.dirname(os.path.abspath(__file__))
    for name in wanted:
        spark.sparkContext.setJobDescription(f"prof:{name}")
        if args.tag:
            df = queries[name](spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(outdir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            spark.catalog.clearCache()
        if args.explain_only:
            print(f"{name}: explain captured")
            continue
        # untimed warm run
        queries[name](spark, args.sf).write.mode("overwrite").format(
            "noop"
        ).save()
        spark.catalog.clearCache()
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            queries[name](spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: best={min(runs)} runs={runs}", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
