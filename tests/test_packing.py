"""Tests for training-set assembly ops (shuffle index, packing, split)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from dots_ocr_ray.kernel.textops import md5_hex
from dots_ocr_ray.pipelines.packing import (
    global_shuffle_index,
    grouped_split,
    pack_sequences,
)

SF_DIR = "/root/testdata/sf0.001"


def test_global_shuffle_index(ray_session):
    import ray.data

    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    out = global_shuffle_index(docs).to_pandas()
    n = len(out)
    # positions are a dense permutation 1..N
    assert sorted(out.shuffle_pos) == list(range(1, n + 1))
    # order matches sequential md5 ordering exactly
    exp = out.copy()
    exp["h"] = [md5_hex(str(i)) for i in exp.doc_id]
    exp = exp.sort_values(["h", "doc_id"]).reset_index(drop=True)
    assert list(exp.shuffle_pos) == list(range(1, n + 1))


def test_global_shuffle_index_stable_across_block_layout(ray_session):
    import ray.data

    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    a = global_shuffle_index(docs).to_pandas().sort_values("doc_id")
    b = (
        global_shuffle_index(docs.repartition(7))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(a.shuffle_pos) == list(b.shuffle_pos)


def test_pack_sequences(ray_session):
    import ray.data

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 10, 11],
            "lang": ["en", "en", "en", "en", "fr", "fr"],
            "n_tokens": [100, 300, 200, 50, 600, 10],
        }
    )
    ds = ray.data.from_pandas(df)
    out = (
        pack_sequences(ds, budget=256).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # en stream offsets: 0, 100, 400, 600 → packs 0,0,1,2 offsets 0,100,144,88
    assert list(out.pack_id[:4]) == [0, 0, 1, 2]
    assert list(out.pack_offset[:4]) == [0, 100, 400 - 256, 600 - 2 * 256]
    # fr stream restarts: offsets 0, 600 → packs 0, 2
    assert list(out.pack_id[4:]) == [0, 2]
    assert list(out.pack_offset[4:]) == [0, 600 - 2 * 256]


def test_rebalance_mixture(ray_session):
    import ray.data

    from dots_ocr_ray.pipelines.packing import rebalance_mixture

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
    )
    out = rebalance_mixture(docs).to_pandas()
    raw = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"])
    target = len(raw) // raw.lang.nunique()
    # every key's slot total hits the equal-weight target exactly
    assert (out.groupby("lang")["n_copies"].sum() == target).all()
    # deterministic across block layout
    again = rebalance_mixture(
        ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
        ).repartition(7)
    ).to_pandas()
    merged = out.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (merged.n_copies_a == merged.n_copies_b).all()


def test_grouped_split_no_leakage(ray_session):
    import ray.data

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"]
    )
    out = grouped_split(docs).to_pandas()
    # every source maps to exactly one side (the leakage guarantee)
    sides = out.groupby("source")["split"].nunique()
    assert (sides == 1).all()
    # rule matches the sequential definition
    for src, side in out.groupby("source")["split"].first().items():
        assert side == ("val" if md5_hex(src)[0] in "0123" else "train")


def test_write_bytes_balanced_shards(ray_session, tmp_path):
    """Byte balance beats row balance under mega-row skew: 400 small
    docs + 4 mega docs must split so no shard holds more than ~one
    bucket over target, every row lands exactly once, markers exist,
    and output is byte-stable (sorted by id within a shard)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from dots_ocr_ray.pipelines.packing import write_bytes_balanced_shards

    ids = list(range(400)) + [1000, 1001, 1002, 1003]
    texts = ["x" * 100] * 400 + ["M" * 20000] * 4
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(8)
    out = str(tmp_path / "shards")
    target = 30000
    manifest = write_bytes_balanced_shards(
        ds, out, target_bytes=target, id_col="doc_id", n_buckets=512
    )
    assert sum(m["rows"] for m in manifest) == 404
    # every shard stays within target + one bucket of slack; with 4
    # mega rows (20 kB each) a row-balanced split would put ~101 rows
    # (incl. ≥1 mega) in some shard → >2× target, so this asserts the
    # BYTE plan actually drove the assignment
    assert len(manifest) >= 3
    for m in manifest:
        assert m["est_bytes"] <= target + 25000  # one mega row of slack
    # files + markers on disk, rows readable and id-sorted
    got_ids = []
    for m in manifest:
        t = pq.read_table(m["path"])
        col = t.column("doc_id").to_pylist()
        assert col == sorted(col)
        got_ids.extend(col)
    assert sorted(got_ids) == sorted(ids)
    import os

    markers = [f for f in os.listdir(out) if f.endswith(".done")]
    assert len(markers) == len(manifest)


def test_row_bytes_handles_variable_width_list_columns():
    """list<string> / list<binary> / nested list columns must not crash
    the byte estimator (pa.DataType.bit_width raises on them)."""
    import numpy as np
    import pyarrow as pa

    from dots_ocr_ray.pipelines.packing import _row_bytes

    t = pa.table(
        {
            "toks": pa.array([["a", "bb"], None, []], type=pa.list_(pa.string())),
            "ids": pa.array([[1, 2], [3], None], type=pa.list_(pa.int64())),
            "raw": pa.array([b"abc", None, b""], type=pa.binary()),
            "nested": pa.array(
                [[[1]], None, [[2, 3]]], type=pa.list_(pa.list_(pa.int64()))
            ),
        }
    )
    sizes = _row_bytes(t)
    assert sizes.dtype == np.int64 and len(sizes) == 3 and (sizes > 0).all()


def test_write_bytes_balanced_shards_with_list_string_column(ray_session, tmp_path):
    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.pipelines.packing import write_bytes_balanced_shards

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(50), type=pa.int64()),
                "links": pa.array(
                    [[f"http://h{i}.com/{j}" for j in range(i % 4)] for i in range(50)],
                    type=pa.list_(pa.string()),
                ),
            }
        )
    )
    manifest = write_bytes_balanced_shards(
        ds, str(tmp_path / "shards"), target_bytes=1 << 12
    )
    assert sum(m["rows"] for m in manifest) == 50


def test_temperature_mixture(ray_session):
    import math

    import ray.data

    from dots_ocr_ray.pipelines.packing import temperature_mixture

    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
    )
    out = temperature_mixture(docs).to_pandas()
    raw = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"])
    counts = raw.lang.value_counts().to_dict()
    total = len(raw)
    ssum = sum(math.isqrt(n) for n in counts.values())
    # each key's slot total hits its integer sqrt-weight target exactly
    sums = out.groupby("lang")["n_copies"].sum().to_dict()
    for k, n in counts.items():
        assert sums[k] == total * math.isqrt(n) // ssum
    # sqrt tempering: copies-per-doc ordering is inverse to key size
    per_doc = {k: sums[k] / counts[k] for k in counts}
    big = max(counts, key=counts.get)
    small = min(counts, key=counts.get)
    if counts[big] > counts[small]:
        assert per_doc[small] >= per_doc[big]
    # deterministic across block layout
    again = temperature_mixture(
        ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
        ).repartition(7)
    ).to_pandas()
    merged = out.merge(again, on="doc_id", suffixes=("_a", "_b"))
    assert (merged.n_copies_a == merged.n_copies_b).all()


def test_compact_parquet_roundtrip_and_resume(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from dots_ocr_ray.pipelines.packing import compact_parquet

    src = tmp_path / "small"
    out = tmp_path / "out"
    rows = pa.table(
        {
            "k": pa.array(list(range(1000)), type=pa.int64()),
            "v": pa.array([f"v{i}" for i in range(1000)], type=pa.string()),
        }
    )
    ray.data.from_arrow(rows).repartition(20).write_parquet(str(src))
    n_in = len(list(src.glob("*.parquet")))
    assert n_in >= 10

    stats = compact_parquet(str(src), str(out), target_bytes=1 << 40)
    assert stats["n_input_files"] == n_in
    assert stats["n_output_files"] == 1  # everything fits one target
    assert stats["rows"] == 1000

    got = pq.read_table(out / "compact-00000.parquet").sort_by("k")
    assert got.equals(rows)

    # resume: a second run sees every marker and rewrites nothing
    mtime = (out / "compact-00000.parquet").stat().st_mtime_ns
    stats2 = compact_parquet(str(src), str(out), target_bytes=1 << 40)
    assert stats2["rows"] == 1000
    assert (out / "compact-00000.parquet").stat().st_mtime_ns == mtime


def test_compact_parquet_target_bytes_splits_groups(ray_session, tmp_path):
    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.pipelines.packing import compact_parquet

    src = tmp_path / "many"
    out = tmp_path / "o2"
    ray.data.from_arrow(
        pa.table({"k": pa.array(list(range(4000)), type=pa.int64())})
    ).repartition(16).write_parquet(str(src))
    sizes = [p.stat().st_size for p in src.glob("*.parquet")]
    # target of ~4 input files per group
    stats = compact_parquet(str(src), str(out), target_bytes=4 * max(sizes))
    assert 2 <= stats["n_output_files"] < stats["n_input_files"]
    total = sum(
        b.num_rows
        for b in ray.data.read_parquet(
            str(out), file_extensions=["parquet"]
        ).iter_batches(batch_format="pyarrow")
    )
    assert total == 4000


def test_zonemap_roundtrip_and_prune_proof(ray_session, tmp_path):
    import json
    import os

    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.pipelines.zonemap import read_range, write_sorted_zonemap

    rows = [{"k": i, "v": (i * 37) % 1000} for i in range(600)]
    ds = ray.data.from_items(rows)
    zdir = str(tmp_path / "zones")
    manifest = write_sorted_zonemap(ds, zdir, sort_col="v", rows_per_file=50)
    assert len(manifest["zones"]) >= 6
    # zones cover the data and are near-disjoint (sorted write)
    los = [z["lo"] for z in manifest["zones"]]
    assert los == sorted(los)

    got = sorted(
        (r["k"], r["v"]) for r in read_range(zdir, 200, 400, columns=["k", "v"]).take_all()
    )
    want = sorted((r["k"], r["v"]) for r in rows if 200 <= r["v"] <= 400)
    assert got == want

    # prune proof: delete every file whose zone misses [200, 400] —
    # results must be unchanged, i.e. those files were never needed
    kept = 0
    for z in manifest["zones"]:
        if z["hi"] < 200 or z["lo"] > 400:
            os.unlink(z["path"])
        else:
            kept += 1
    assert kept < len(manifest["zones"])
    got2 = sorted(
        (r["k"], r["v"]) for r in read_range(zdir, 200, 400, columns=["k", "v"]).take_all()
    )
    assert got2 == want

    # empty range returns zero rows with the right schema
    empty = read_range(zdir, -10, -5, columns=["k", "v"])
    assert empty.count() == 0


def test_cluster_leak_split_no_straddle(ray_session):
    """No near-dup cluster may straddle the train/val boundary."""
    import collections

    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.pipelines.packing import grouped_split

    clusters = ray.data.from_items(
        [{"doc_id": i, "cluster_id": i % 7} for i in range(60)]
    )

    def _key(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "cluster_key", batch.column("cluster_id").cast(pa.string())
        )

    out = grouped_split(
        clusters.map_batches(_key, batch_format="pyarrow"), group_col="cluster_key"
    ).take_all()
    sides = collections.defaultdict(set)
    for r in out:
        sides[r["cluster_id"]].add(r["split"])
    assert all(len(s) == 1 for s in sides.values())
    assert {s for ss in sides.values() for s in ss} == {"train", "val"}


def test_position_deletes_roundtrip(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.pipelines.packing import (
        read_with_position_deletes,
        write_position_deletes,
    )

    tbl = pa.table(
        {"id": list(range(100)), "v": [f"row{i}" for i in range(100)]}
    )
    snap = str(tmp_path / "snap")
    dels = str(tmp_path / "dels")
    ray.data.from_arrow(tbl).repartition(4).write_parquet(snap)

    delete_ids = np.array([0, 5, 17, 42, 99], dtype=np.int64)
    stats = write_position_deletes(snap, id_col="id", delete_ids=delete_ids, out_dir=dels)
    assert stats["n_deletes"] == 5 and stats["n_files"] >= 4

    out = read_with_position_deletes(snap, dels).to_pandas()
    assert len(out) == 95
    assert set(delete_ids.tolist()).isdisjoint(set(out["id"].tolist()))

    # resume: re-running the write skips finished files, same counts
    stats2 = write_position_deletes(snap, id_col="id", delete_ids=delete_ids, out_dir=dels)
    assert stats2["n_deletes"] == 5

    # empty delete set → full table back
    dels2 = str(tmp_path / "dels2")
    write_position_deletes(snap, id_col="id", delete_ids=np.array([], np.int64), out_dir=dels2)
    assert read_with_position_deletes(snap, dels2).count() == 100


def test_position_deletes_rejects_different_id_set(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pytest

    import ray.data

    from dots_ocr_ray.pipelines.packing import write_position_deletes

    tbl = pa.table({"id": list(range(20)), "v": ["x"] * 20})
    snap = str(tmp_path / "snap")
    dels = str(tmp_path / "dels")
    ray.data.from_arrow(tbl).repartition(2).write_parquet(snap)
    write_position_deletes(
        snap, id_col="id", delete_ids=np.array([1, 2], np.int64), out_dir=dels
    )
    with pytest.raises(ValueError, match="different"):
        write_position_deletes(
            snap, id_col="id", delete_ids=np.array([3], np.int64), out_dir=dels
        )


# --- MLM masking ------------------------------------------------------------

def test_mlm_mask_deterministic_and_rate():
    import hashlib

    from dots_ocr_ray.pipelines.packing import mlm_mask_text

    text = " ".join(f"tok{i}" for i in range(1000))
    m1 = mlm_mask_text(42, text)
    m2 = mlm_mask_text(42, text)
    assert m1 == m2
    masked_text, n_tok, n_m = m1
    assert n_tok == 1000
    # expected rate 38/256 ≈ 14.8%; binomial slack
    assert 100 <= n_m <= 200
    # spot-check the rule on position 0
    first_masked = hashlib.md5(b"42:0").digest()[0] < 0x26
    assert masked_text.split(" ")[0] == ("[MASK]" if first_masked else "tok0")
    # subset reproducibility: same doc id -> same prefix decisions
    assert mlm_mask_text(42, "tok0 tok1")[0] == " ".join(masked_text.split(" ")[:2])


def test_mlm_mask_edge_cases():
    from dots_ocr_ray.pipelines.packing import mlm_mask_text

    assert mlm_mask_text(7, "") == ("", 0, 0)
    assert mlm_mask_text(7, " \t\n ") == ("", 0, 0)
    # internal whitespace folds to single spaces (regex split + join)
    out, n_tok, _ = mlm_mask_text(3, "a  b\tc\nd")
    assert n_tok == 4 and "  " not in out


def test_mlm_masked_docs_dataset():
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.pipelines.packing import mlm_mask_text, mlm_masked_docs

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["alpha beta gamma", "", "x y"], type=pa.string()),
        }
    )
    out = {r["doc_id"]: r for r in mlm_masked_docs(ray.data.from_arrow(t)).take_all()}
    for d, txt in [(1, "alpha beta gamma"), (2, ""), (3, "x y")]:
        m, nt, nm = mlm_mask_text(d, txt)
        assert out[d]["masked_text"] == m
        assert out[d]["n_tokens"] == nt and out[d]["n_masked"] == nm


# --- span corruption ----------------------------------------------------------

def test_span_corrupt_invariants():
    import hashlib

    from dots_ocr_ray.pipelines.packing import span_corrupt_text

    text = " ".join(f"w{i}" for i in range(40))
    c, t, k = span_corrupt_text(9, text)
    assert span_corrupt_text(9, text) == (c, t, k)  # deterministic
    # sentinels numbered densely in both streams and closing sentinel present
    for j in range(k):
        assert f"<extra_id_{j}>" in c and f"<extra_id_{j}>" in t
    assert t.endswith(f"<extra_id_{k}>")
    # reconstruction: splicing targets back into corrupted restores text
    toks_c = c.split(" ")
    spans = {}
    cur = None
    for tok in t.split(" "):
        if tok.startswith("<extra_id_"):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    rebuilt = []
    for tok in toks_c:
        rebuilt.extend(spans.get(tok, [tok]) if tok.startswith("<extra_id_") else [tok])
    assert " ".join(rebuilt) == text
    # fire rule spot-check at position 0
    fired0 = hashlib.md5(b"9|0").digest()[0] < 0x66
    assert (c.split(" ")[0] == "<extra_id_0>") == fired0


def test_span_corrupt_edges():
    import pytest

    from dots_ocr_ray.pipelines.packing import span_corrupt_text

    assert span_corrupt_text(1, "") == ("", "", 0)
    assert span_corrupt_text(1, "  \n ") == ("", "", 0)
    with pytest.raises(ValueError):
        span_corrupt_text(1, "a b", stride=2, span_len=3)
    # single token: either kept or fully masked, closing sentinel always
    c, t, k = span_corrupt_text(123, "solo")
    assert t.endswith(f"<extra_id_{k}>") and k in (0, 1)
