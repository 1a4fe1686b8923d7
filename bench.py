#!/usr/bin/env python
"""Benchmark harness.

Default mode: ONE JSON line with the headline pipeline's wall time plus
per-query timings over $GRAFT_SF_DIR (default /root/testdata/sf0.1),
under ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32).

Headline = the flagship extraction pipeline end-to-end: synthetic
Common-Crawl-style pages (seeded, written once to /tmp and reused) →
actor-pool extraction → partitioned parquet sink with markers.

--scaling: runs the headline twice in FRESH processes at num_cpus=8 and
num_cpus=32 on the same input and reports both throughputs plus
scaling efficiency = (t8/t32)/4 (the sandbox stand-in for the N vs 4N
node cluster runs; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "20000"))
PAGES_CACHE = f"/tmp/graft_bench/pages_{N_PAGES}.parquet"


def ensure_bench_pages() -> str:
    """Generate the seeded pages table once (untimed setup), multiple
    row groups so read_parquet yields many blocks."""
    if os.path.exists(PAGES_CACHE):
        return PAGES_CACHE
    os.makedirs(os.path.dirname(PAGES_CACHE), exist_ok=True)
    import pyarrow.parquet as pq

    from dots_ocr_ray.fixtures import make_mega_page, make_pages_table

    table = make_pages_table(N_PAGES, seed=42)
    import pyarrow as pa

    mega = pa.Table.from_pylist([make_mega_page()], schema=table.schema)
    table = pa.concat_tables([table, mega])
    tmp = PAGES_CACHE + ".tmp"
    pq.write_table(table, tmp, row_group_size=max(256, N_PAGES // 64), compression="zstd")
    os.replace(tmp, PAGES_CACHE)
    return PAGES_CACHE


def run_headline() -> dict:
    import pyarrow.parquet as pq

    import ray

    from dots_ocr_ray.pipelines.extract import (
        check_fail_gate,
        extract_pages,
        read_pages,
        write_extracted,
    )

    pages_path = ensure_bench_pages()
    meta = pq.ParquetFile(pages_path).metadata
    n_rows = meta.num_rows
    html_bytes = sum(
        meta.row_group(i).column(2).total_uncompressed_size for i in range(meta.num_row_groups)
    )

    out_dir = "/tmp/graft_bench/out"
    shutil.rmtree(out_dir, ignore_errors=True)

    # warm the page cache (untimed read)
    with open(pages_path, "rb") as f:
        while f.read(1 << 24):
            pass

    t0 = time.perf_counter()
    ds = read_pages(pages_path)
    extracted = extract_pages(
        ds,
        batch_size=128,
        concurrency=max(2, NUM_CPUS - 2),
        num_partitions=max(64, NUM_CPUS * 4),
    )
    metrics = write_extracted(extracted, out_dir, num_partitions=max(64, NUM_CPUS * 4))
    stats = check_fail_gate(metrics, threshold=0.25)
    elapsed = time.perf_counter() - t0
    return {
        "sec": round(elapsed, 3),
        "rows": n_rows,
        "docs_per_sec": round(n_rows / elapsed, 1),
        "html_mb_per_sec": round(html_bytes / 1e6 / elapsed, 1),
        "status_totals": stats,
    }


def run_queries() -> dict:
    import __ray_entry__ as entry_mod

    import ray.data

    timings = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        if isinstance(res, ray.data.Dataset):
            res.materialize()
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    headline = run_headline()
    queries = {} if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") else run_queries()
    result = {
        "metric": "extract_pages_e2e_sec",
        "value": headline["sec"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": headline["rows"],
        "docs_per_sec": headline["docs_per_sec"],
        "html_mb_per_sec": headline["html_mb_per_sec"],
    }
    print(json.dumps(result))
    ray.shutdown()


def scaling() -> None:
    """Same input, fresh ray sessions at 8 and 32 CPUs (N vs 4N)."""
    ensure_bench_pages()

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "sec_8": r_lo["value"],
                "sec_32": r_hi["value"],
                "docs_per_sec_8": r_lo["docs_per_sec"],
                "docs_per_sec_32": r_hi["docs_per_sec"],
                "rows": r_lo["rows"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
