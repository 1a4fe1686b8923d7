"""Distributed 2-D skyline: kernel correctness vs brute force,
tie/duplicate semantics, and block-count invariance."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data

from dots_ocr_ray.pipelines.skyline import local_skyline, skyline_2d


def _brute(points):
    """O(n²) reference: p survives iff no q with >= on both, > on one."""
    out = []
    for i, (px, py) in enumerate(points):
        dominated = any(
            (qx >= px and qy >= py and (qx > px or qy > py))
            for j, (qx, qy) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((px, py))
    return sorted(out)


def _tbl(points):
    return pa.table(
        {
            "x": pa.array([p[0] for p in points], pa.float64()),
            "y": pa.array([p[1] for p in points], pa.int64()),
        }
    )


CASES = [
    # staircase with interior dominated points
    [(1.0, 10), (2.0, 9), (3.0, 8), (2.5, 8), (0.5, 11), (3.0, 7)],
    # ties on y: only group-max x survives per y unless dominated above
    [(5.0, 1), (5.0, 2), (4.0, 2), (6.0, 0)],
    # exact duplicates: both copies survive
    [(7.0, 7), (7.0, 7), (1.0, 1)],
    # single point / all-equal column
    [(3.0, 3)],
    [(1.0, 5), (2.0, 5), (2.0, 5)],
]


@pytest.mark.parametrize("points", CASES)
def test_local_skyline_matches_brute(points):
    res = local_skyline(_tbl(points), "x", "y")
    got = sorted(zip(res.column("x").to_pylist(), res.column("y").to_pylist()))
    assert got == _brute(points)


def test_distributed_matches_single_block(ray_session):
    import random

    rng = random.Random(7)
    points = [(float(rng.randint(0, 50)), rng.randint(0, 50)) for _ in range(400)]
    ds = ray.data.from_arrow(_tbl(points)).repartition(8)
    res = skyline_2d(ds, "x", "y").to_pandas()
    got = sorted(zip(res["x"], res["y"]))
    assert got == _brute(points)


def test_empty_dataset(ray_session):
    ds = ray.data.from_arrow(_tbl([])).repartition(2)
    assert skyline_2d(ds, "x", "y").count() == 0


def test_int64_dims_above_2_53_stay_exact(ray_session):
    big = 2**53
    # (big+1, 0) dominates (big, 0) only under exact int compare
    tbl = pa.table(
        {
            "x": pa.array([big, big + 1], pa.int64()),
            "y": pa.array([0, 0], pa.int64()),
        }
    )
    res = local_skyline(tbl, "x", "y")
    assert res.column("x").to_pylist() == [big + 1]
