#!/usr/bin/env python
"""Two-parallelism scaling evidence for the curation surface.

scale_bench.py evidences the north-rule flagship (parse→enrich→route→
aggregate); this runs the same N vs 4N protocol over the heaviest
curation operator — exactsubstr_dedup's stride-1 seed count + island
rewrite, the engine's densest keys-only shuffle feeder — so the
training-data ops carry their own scaling datum instead of inheriting
the flagship's.

Protocol: identical to scale_bench.py (empirically derived — see
BENCH/BASELINE.md): levels 1 → 4 inside the VM's honest ~10-12
effective-core envelope, interleaved REPS in fresh JVMs with minima,
shuffle partitions fixed for the DATA at both levels, terminal action
a noop-sink write (every output row produced, no driver transfer, no
disk — disk doesn't scale with cores on one laptop, a cluster's
aggregate disk does). Input: the sf0.1 documents table replicated
REPL× with re-keyed doc_ids (written once, shared by every rep).

Usage: python scripts/curation_scale.py [repl] → one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPS = 3
N_SMALL, N_BIG = 1, 4
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from apm_opentelemetry_collector_spark.session import get_spark
from apm_opentelemetry_collector_spark.operators.dedup import exactsubstr_dedup
from pyspark.sql import functions as F

cores = {cores}
spark = get_spark("curation-scale-%d" % cores, cores=cores,
                  shuffle_partitions=64,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
inp = {inp!r}
if not os.path.isdir(inp):
    docs = spark.read.parquet({sf!r} + "/documents.parquet")
    n = docs.count()
    parts = [docs.select((F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                         "text") for k in range({repl})]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(16).write.mode("overwrite").parquet(inp)
spark.range(1000).select(F.sum("id")).collect()  # JVM/codegen warm-up
t0 = time.time()
exactsubstr_dedup(spark.read.parquet(inp)).write.format("noop").mode(
    "overwrite").save()
print(json.dumps({{"cores": cores, "sec": time.time() - t0}}))
"""


def run_once(cores: int, repl: int, inp: str) -> float:
    code = CHILD.format(root=ROOT, cores=cores, repl=repl, inp=inp, sf=SF_DIR)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    if res.returncode != 0:
        raise RuntimeError(res.stderr[-2000:])
    return json.loads(res.stdout.strip().splitlines()[-1])["sec"]


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2
    inp = os.path.join(tempfile.mkdtemp(prefix="cur_scale_"), "input")
    samples: dict[int, list[float]] = {N_SMALL: [], N_BIG: []}
    for _ in range(REPS):  # interleaved so host noise hits both levels alike
        for cores in (N_BIG, N_SMALL):
            samples[cores].append(run_once(cores, repl, inp))
    t_small, t_big = min(samples[N_SMALL]), min(samples[N_BIG])
    eff = (t_small / t_big) / (N_BIG / N_SMALL)
    print(
        json.dumps(
            {
                "repl": repl,
                "cores_N": N_SMALL,
                "cores_4N": N_BIG,
                "sec_N": round(t_small, 2),
                "sec_4N": round(t_big, 2),
                "samples_N": [round(s, 2) for s in samples[N_SMALL]],
                "samples_4N": [round(s, 2) for s in samples[N_BIG]],
                "scaling_efficiency": round(eff, 3),
                "job": "exactsubstr_dedup (seed count + island rewrite, noop-terminal)",
            }
        )
    )


if __name__ == "__main__":
    main()
