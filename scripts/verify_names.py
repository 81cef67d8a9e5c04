"""Drive named queries through the driver contract with a PLAIN
SparkSession (the /verify recipe): full value-level parity via
testing.compare_to_oracle at the given sf dir.

Usage: python scripts/verify_names.py [sf_dir] name [name ...]
       (sf_dir defaults to /root/testdata/sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf, args = args[0], args[1:]
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    from programmers_data_spark.testing import compare_to_oracle

    qs, os_ = E.queries(), E.oracle_sql()
    from programmers_data_spark import registry

    registry.load_all()
    names = args or list(qs)
    bad = 0
    gated = 0
    for name in names:
        fn = registry.QUERIES[name]
        # a dependency-gated query (e.g. the protobuf-gated tws
        # variant) raises ImportError/ModuleNotFoundError at call time
        # by design — count it separately from real failures so the
        # exit code reports only genuine breaks (r16 ADVICE #2)
        try:
            df = fn(spark, sf)
            if name not in registry.ORACLE:
                n = df.count()
                print(f"{name}: rows-only, {n} rows", flush=True)
                continue
            res = compare_to_oracle(name, df, registry.ORACLE[name], sf)
        except ImportError as e:
            print(f"{name}: GATED {type(e).__name__}: {e}"[:300],
                  flush=True)
            gated += 1
            continue
        except Exception as e:  # noqa: BLE001 — sweep must finish
            print(f"{name}: ERR {type(e).__name__}: {e}"[:300],
                  flush=True)
            bad += 1
            continue
        ok = res.ok if hasattr(res, "ok") else not res.mismatches
        print(f"{name}: {'OK' if ok else 'FAIL ' + str(res)}", flush=True)
        bad += 0 if ok else 1
    if gated:
        print(f"gated (expected dependency gates, not failures): {gated}",
              flush=True)
    return bad


if __name__ == "__main__":
    raise SystemExit(main())
