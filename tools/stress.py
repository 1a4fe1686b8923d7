"""Dedup scale/stress harness — reproduces the BASELINE.md evidence.

Builds two deterministic 100k-doc corpora from the sf0.1 documents
table (20× replication) and times minhash_lsh_dedup on both:

* ``distinct``  — every rep's words are suffixed per-rep, so no
  cross-rep near-dups: the clean 20×-scale linearity check.
* ``dup-heavy`` — reps append one token, so ~95% of docs are near-dups
  (~1M true pairs): the adversarial candidate-explosion case.

    python tools/stress.py [sf_dir] [out_base]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dots_ocr_ray.util import make_quiet_hook as _make_quiet
from dots_ocr_ray.util import quiet_ray_data_schema_warnings as _quiet


def build_corpus(sf_dir: str, out_dir: str, mode: str, reps: int = 20) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(f"{out_dir}/_DONE"):
        return
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n = t.num_rows
    for rep in range(reps):
        ids = pa.array([i + rep * n for i in t.column("doc_id").to_pylist()], type=pa.int64())
        if rep == 0:
            texts = t.column("text")
        elif mode == "distinct":
            texts = pa.array(
                [" ".join(f"{w}{rep}" for w in (x or "").split()) for x in t.column("text").to_pylist()]
            )
        else:  # dup-heavy: one appended token keeps Jaccard ≈ 0.99
            texts = pa.array([f"{x} rep{rep}" for x in t.column("text").to_pylist()])
        pq.write_table(pa.table({"doc_id": ids, "text": texts}), f"{out_dir}/part-{rep:03d}.parquet")
    open(f"{out_dir}/_DONE", "w").write("")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    base = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dedup_stress"
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        _quiet()
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR", runtime_env={"worker_process_setup_hook": _make_quiet()})
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import json

    import ray.data

    from dots_ocr_ray.pipelines.dedup import minhash_lsh_dedup
    from dots_ocr_ray.pipelines.substring import substring_dedup

    want_stats = "--stats" in sys.argv
    results = {}
    reps = int(os.environ.get("GRAFT_STRESS_REPS", "20"))
    suffix = f"_r{reps}" if reps != 20 else ""
    for mode in ("distinct", "dup-heavy"):
        d = f"{base}_{mode}{suffix}"
        build_corpus(sf_dir, d, mode, reps=reps)
        ds = ray.data.read_parquet(d, columns=["doc_id", "text"])
        t0 = time.perf_counter()
        out = minhash_lsh_dedup(ds, threshold=0.8)
        rows = out.count()
        dt = time.perf_counter() - t0
        results[mode] = {"sec": round(dt, 1), "rows": rows, "docs_per_sec": round(rows / dt, 1)}
        print(f"{mode}: {dt:.1f}s, {rows} rows")
        if want_stats and mode == "dup-heavy":
            # per-stage breakdown of the adversarial exchange (the
            # BASELINE stats table VERDICT r3 item 7 asked for):
            # re-run the two sub-phases separately so the candidate
            # exchange and the component assignment localize, and dump
            # the pair-phase plan stats
            from dots_ocr_ray.pipelines.dedup import (
                cluster_assign,
                minhash_candidate_pairs,
            )

            ds2 = ray.data.read_parquet(d, columns=["doc_id", "text"])
            t1 = time.perf_counter()
            pairs = minhash_candidate_pairs(ds2, threshold=0.8).materialize()
            t_pairs = time.perf_counter() - t1
            n_pairs = pairs.count()
            t2 = time.perf_counter()
            cc = cluster_assign(ds2.select_columns(["doc_id"]), pairs, id_col="doc_id")
            cc.count()
            t_cc = time.perf_counter() - t2
            results["dup-heavy_phases"] = {
                "pairs_sec": round(t_pairs, 1),
                "n_pairs": n_pairs,
                "components_sec": round(t_cc, 1),
            }
            print(
                f"dup-heavy phases: candidate pairs {t_pairs:.1f}s "
                f"({n_pairs} pairs), components {t_cc:.1f}s"
            )
            print("=== dup-heavy candidate-pairs ds.stats() ===")
            print(pairs.stats())
    if os.environ.get("GRAFT_STRESS_SKIP_SUBSTRING"):
        print(json.dumps({"metric": "dedup_stress", "num_cpus": ncpu, **results}))
        ray.shutdown()
        return
    # exact-substring dedup over the dup-heavy corpus: every base
    # text's 8-grams repeat across its 19 replicas, so nearly every
    # token position is covered — the span-removal worst case
    ds = ray.data.read_parquet(f"{base}_dup-heavy{suffix}", columns=["doc_id", "text"]).materialize()
    t0 = time.perf_counter()
    out = substring_dedup(ds, k=8, min_count=2)
    dropped = out.map_batches(
        lambda b: b.select(["n_dropped"]), batch_format="pyarrow"
    ).sum("n_dropped")
    dt = time.perf_counter() - t0
    results["substring_dup-heavy"] = {"sec": round(dt, 1), "tokens_dropped": int(dropped)}
    print(f"substring dup-heavy: {dt:.1f}s, {dropped} tokens dropped")
    print(json.dumps({"metric": "dedup_stress", "num_cpus": ncpu, **results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
