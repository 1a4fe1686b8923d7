"""Market-basket association rules: hand-computed fixture parity and
pair-emission correctness under multi-block input."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from dots_ocr_ray.pipelines.basket import association_rules


def _fixture_ds(num_blocks: int = 1) -> ray.data.Dataset:
    # baskets: 1:{10,20,30} 2:{10,20} 3:{10,20,20(dup)} 4:{30} 5:{10,40}
    baskets = [1, 1, 1, 2, 2, 3, 3, 3, 4, 5, 5]
    items = [10, 20, 30, 10, 20, 10, 20, 20, 30, 10, 40]
    t = pa.table(
        {
            "basket": pa.array(baskets, type=pa.int64()),
            "item": pa.array(items, type=pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(num_blocks)


def test_hand_computed_rules():
    out = association_rules(
        _fixture_ds(), basket_col="basket", item_col="item", min_support=2
    )
    rows = {
        (r["item_a"], r["item_b"]): r for r in out.to_pylist()
    }
    # (10,20) co-occurs in baskets 1,2,3 => support 3; n_10=4, n_20=3, N=5
    assert set(rows) == {(10, 20)}
    r = rows[(10, 20)]
    assert r["support"] == 3
    assert r["conf_micro"] == (1_000_000 * 3) // 4
    assert r["lift_micro"] == (1_000_000 * 3 * 5) // (4 * 3)


def test_partition_invariance():
    a = association_rules(
        _fixture_ds(1), basket_col="basket", item_col="item", min_support=1
    )
    b = association_rules(
        _fixture_ds(4), basket_col="basket", item_col="item", min_support=1
    )
    assert a.to_pylist() == b.to_pylist()
    # min_support=1: pairs (10,20)x3, (10,30), (20,30), (10,40)
    sup = {(r["item_a"], r["item_b"]): r["support"] for r in a.to_pylist()}
    assert sup == {(10, 20): 3, (10, 30): 1, (20, 30): 1, (10, 40): 1}


def test_wide_ids_auto_fallback():
    """Items above 2^31 route (via the auto probe) to the two-column
    pair path and produce exact rules at any id magnitude."""
    big = 1 << 40
    t = pa.table(
        {
            "basket": pa.array([1, 1, 2, 2, 3, 3, 3], type=pa.int64()),
            "item": pa.array([big, 2, big, 2, big, 2, big + 5], type=pa.int64()),
        }
    )
    out = association_rules(
        ray.data.from_arrow(t).repartition(3),
        basket_col="basket",
        item_col="item",
        min_support=2,
    )
    rows = {(r["item_a"], r["item_b"]): r for r in out.to_pylist()}
    # (2, big) co-occurs in baskets 1,2,3: support 3, n_2=3, n_big=3, N=3
    assert set(rows) == {(2, big)}
    r = rows[(2, big)]
    assert r["support"] == 3
    assert r["conf_micro"] == 1_000_000
    assert r["lift_micro"] == (1_000_000 * 3 * 3) // (3 * 3)


def test_wide_path_parity_with_packed():
    """Forcing wide_ids=True on narrow-id input must reproduce the
    packed path bit-for-bit (tier parity)."""
    a = association_rules(
        _fixture_ds(4), basket_col="basket", item_col="item", min_support=1
    )
    b = association_rules(
        _fixture_ds(4),
        basket_col="basket",
        item_col="item",
        min_support=1,
        wide_ids=True,
    )
    assert a.to_pylist() == b.to_pylist()
