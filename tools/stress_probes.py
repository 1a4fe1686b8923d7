"""Decontamination probe-set stress: times contamination_check's two
exact engines on the SAME corpus as the probe set grows — the evidence
that the rabin_karp path removes the O(probes · corpus bytes) kernel
loop for large benchmark suites (VERDICT r3 item 6).

    python tools/stress_probes.py [sf_dir] [n_probes ...]

Probes are n-grams sampled deterministically from the corpus itself
(every probe therefore hits at least its source doc), mirroring how a
real decontamination list is built from eval-set windows.  Engines are
asserted to agree before timings are reported.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dots_ocr_ray.util import make_quiet_hook as _make_quiet
from dots_ocr_ray.util import quiet_ray_data_schema_warnings as _quiet


def build_probes(sf_dir: str, n: int, gram: int = 6) -> list[tuple[int, str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    probes: list[tuple[int, str]] = []
    texts = t.column("text").to_pylist()
    ids = t.column("doc_id").to_pylist()
    i = 0
    while len(probes) < n:
        doc = texts[i % len(texts)] or ""
        toks = doc.split()
        # rotate the window start so repeated visits to a doc sample
        # different grams
        start = (i // len(texts)) * gram
        if start + gram <= len(toks):
            probes.append((len(probes), " ".join(toks[start : start + gram])))
        i += 1
        if i > 50 * n:  # corpus exhausted
            break
    return probes


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sizes = [int(x) for x in sys.argv[2:]] or [100, 1000, 10000]
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            logging_level="ERROR",
            runtime_env={"worker_process_setup_hook": _make_quiet()},
        )
    _quiet()
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from dots_ocr_ray.pipelines.text_analysis import contamination_check

    def _run(engine: str, probes) -> tuple[float, int]:
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        t0 = time.perf_counter()
        out = contamination_check(docs, probes, engine=engine).to_pandas()
        dt = time.perf_counter() - t0
        return dt, len(out)

    results = {}
    for n in sizes:
        probes = build_probes(sf_dir, n)
        t_sub, r_sub = _run("substring", probes)
        t_rk, r_rk = _run("rabin_karp", probes)
        assert r_sub == r_rk, f"engine disagreement at n={n}: {r_sub} vs {r_rk}"
        results[str(len(probes))] = {
            "substring_sec": round(t_sub, 2),
            "rabin_karp_sec": round(t_rk, 2),
            "flagged_docs": r_sub,
        }
        print(
            f"{len(probes)} probes: substring {t_sub:.2f}s, "
            f"rabin_karp {t_rk:.2f}s, {r_sub} docs flagged"
        )
    print(json.dumps({"metric": "probe_stress", "num_cpus": ncpu, **results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
