#!/usr/bin/env python
"""Oracle-drive a SUBSET of registry queries (args) at sf0.001 + sf0.01
— the fast inner loop for kernel-touching changes; the full drive stays
tools/r13/verify_drive.py."""

import os
import sys

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
os.chdir(_REPO_ROOT)

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from tests.parity import assert_frames_match, run_oracle  # noqa: E402

names = sys.argv[1:]
spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
qs, oracles = entrymod.queries(), entrymod.oracle_sql()
for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
    for name in names:
        spdf = qs[name](spark, sf).toPandas()
        assert_frames_match(spdf, run_oracle(oracles[name], sf), name)
        print(f"OK {os.path.basename(sf)} {name}", flush=True)
print("SUBSET DRIVE OK")
