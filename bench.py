"""Benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.md): end-to-end change-event apply throughput
(events/sec) through the full engine — generate → LWW dedup → vectorized
extraction → bucketed MERGE commit — plus per-query seconds for the
representative operator queries at $SPARK_GRAFT_SF_DIR.

Modes:
  python bench.py              # single run at local[$SPARK_GRAFT_CPUS]
  python bench.py --scaling    # same job at local[8] and local[32] on the
                               # same input; reports both throughputs +
                               # efficiency and rewrites BENCH/BASELINE.md

Determinism: the event log is seeded (fixtures.distributed_events_df); the
log is materialized to parquet first so generation cost is excluded from
the apply-throughput measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("BENCH_EVENTS", "40000"))
N_KEYS = int(os.environ.get("BENCH_KEYS", "8000"))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "topk_orders_per_customer",
    "lww_last_event_per_user",
    "dedup_exact_documents",
    "token_stats_documents",
    "quality_documents",
    "minhash_near_dups",
    "simhash_documents",
    "embedding_norms",
    "ann_cosine_topk",
]


def _make_events_parquet(spark, path: str) -> int:
    from emailcdc.fixtures import distributed_events_df
    df = distributed_events_df(spark, N_EVENTS, N_KEYS)
    df.write.mode("overwrite").parquet(path)
    return N_EVENTS


def _run_replay(spark, events_path: str, sink_root: str) -> float:
    """Replay the full log; returns wall seconds (engine work only)."""
    from emailcdc.engine import CdcEngine
    from emailcdc.sink import SnapshotParquetSink

    events = spark.read.parquet(events_path)
    engine = CdcEngine(spark, SnapshotParquetSink(spark, sink_root, n_buckets=64))
    t0 = time.time()
    engine.replay(events, batch_size=max(N_EVENTS // 4, 1))
    return time.time() - t0


def _bench_session(master: str, shuffle_partitions: int):
    from emailcdc.session import get_spark
    spark = get_spark(app=f"bench-{master}", master=master,
                      shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _throughput_at(master: str, parallelism: int, events_path: str) -> float:
    spark = _bench_session(master, parallelism)
    sink_root = tempfile.mkdtemp(prefix=f"bench_sink_{parallelism}_")
    try:
        secs = _run_replay(spark, events_path, sink_root)
        return N_EVENTS / secs
    finally:
        shutil.rmtree(sink_root, ignore_errors=True)
        spark.stop()


def main() -> None:
    scaling = "--scaling" in sys.argv
    work = tempfile.mkdtemp(prefix="bench_events_")
    events_path = os.path.join(work, "events.parquet")

    # generate the log once with a neutral session
    gen_spark = _bench_session(f"local[{CPUS}]", CPUS)
    _make_events_parquet(gen_spark, events_path)
    gen_spark.stop()

    result: dict = {"sf": SF_DIR.rstrip("/").split("sf")[-1],
                    "n_events": N_EVENTS, "n_keys": N_KEYS}
    try:
        if scaling:
            thr_8 = _throughput_at("local[8]", 8, events_path)
            thr_32 = _throughput_at(f"local[{CPUS}]", CPUS, events_path)
            eff = thr_32 / ((CPUS / 8) * thr_8)
            result.update(
                {
                    "metric": "cdc_apply_throughput_events_per_sec",
                    "value": round(thr_32, 1),
                    "unit": "events/sec",
                    "throughput_local8": round(thr_8, 1),
                    f"throughput_local{CPUS}": round(thr_32, 1),
                    "scaling_efficiency": round(eff, 3),
                }
            )
            _write_baseline_md(thr_8, thr_32, eff)
            print(json.dumps(result))
            return

        spark = _bench_session(f"local[{CPUS}]", CPUS)
        sink_root = tempfile.mkdtemp(prefix="bench_sink_")
        try:
            secs = _run_replay(spark, events_path, sink_root)
            throughput = N_EVENTS / secs

            import __spark_entry__ as entrymod
            qs = entrymod.queries()
            timings: dict[str, float] = {}
            for name in BENCH_QUERIES:
                t0 = time.time()
                qs[name](spark, SF_DIR).collect()
                timings[name] = round(time.time() - t0, 3)
            result.update(
                {
                    "metric": "cdc_apply_throughput_events_per_sec",
                    "value": round(throughput, 1),
                    "unit": "events/sec",
                    "replay_sec": round(secs, 2),
                    "queries": timings,
                }
            )
            print(json.dumps(result))
        finally:
            shutil.rmtree(sink_root, ignore_errors=True)
            spark.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _write_baseline_md(thr_8: float, thr_32: float, eff: float) -> None:
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(
            "# BENCH — scaling evidence (north rule)\n\n"
            "Same job (full CDC replay: LWW dedup → vectorized extraction →\n"
            "bucketed MERGE commit) on the same seeded input "
            f"({N_EVENTS} events, {N_KEYS} keys), two parallelism levels in\n"
            "this single-host sandbox (stand-in for N vs 4N executors):\n\n"
            "| parallelism | throughput (events/sec) |\n|---|---|\n"
            f"| local[8]  | {thr_8:.1f} |\n"
            f"| local[32] | {thr_32:.1f} |\n\n"
            f"**Scaling efficiency** = throughput_4N / (4 × throughput_N) = "
            f"{eff:.3f} (target ≥ 0.8)\n"
        )


if __name__ == "__main__":
    main()
