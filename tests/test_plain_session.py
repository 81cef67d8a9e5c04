"""The driver runs __spark_entry__ in a PLAIN SparkSession — no
engine builder defaults — so any runtime-conf assumption (session
timezone, TIMESTAMP(NANOS) parquet reads, NTZ inference, excluded
optimizer rules) must be pinned by catalog.load_table at call time,
not by session construction. This drives that contract in a fresh
subprocess JVM, the way the verify recipe does by hand; it exists
because exactly this class of bug shipped twice (r1 tz/nanos, r4
NTZ inference) while every in-process test stayed green.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[4]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E

rows = E.entry(spark).collect()
assert rows and len(rows) > 0, "entry returned no rows"

from programmers_data_spark import registry
registry.load_all()
sf = "/root/testdata/sf0.01"
# conf-sensitive picks: events TIMESTAMP(NANOS) scan + tz-dependent
# formatting (daily_filter, ohlc_daily), a bounded-window query that
# needs the excluded-rule pin (corpus_shuffle), and a streaming drain
for name in ("daily_filter", "ohlc_daily", "corpus_shuffle"):
    n = registry.QUERIES[name](spark, sf).count()
    assert n > 0, f"{name} empty in plain session"
print("PLAIN_OK")
"""


def test_driver_contract_in_plain_session():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PLAIN_OK" in out.stdout
