"""Output FILES are byte-identical across independent runs — the
strongest determinism guarantee (content equality is asserted
elsewhere; this pins the on-disk bytes, which is what makes content-
hash markers and downstream caching trustworthy)."""

import glob
import hashlib
import os

import pyarrow.parquet as pq
import pytest

from dots_ocr_ray.fixtures import make_pages_table
from dots_ocr_ray.pipelines.extract import extract_shards


def _file_hashes(d):
    return {
        os.path.basename(f): hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in glob.glob(os.path.join(d, "part-*.parquet"))
    }


def test_shard_outputs_byte_identical_across_runs(ray_session, tmp_path):
    pages = make_pages_table(48, seed=42)
    files = []
    for s in range(4):
        f = str(tmp_path / f"in-{s}.parquet")
        pq.write_table(pages.slice(s * 12, 12), f)
        files.append(f)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    extract_shards(files, out_a, concurrency=2)
    extract_shards(files, out_b, concurrency=2, dispatch="tasks")  # even across dispatchers
    ha, hb = _file_hashes(out_a), _file_hashes(out_b)
    assert ha and ha == hb
