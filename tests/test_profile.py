"""profile_table: one-pass mergeable column profiling."""

import pyarrow as pa

import ray.data

from dots_ocr_ray.pipelines.profile import profile_table


def test_profile_nulls_and_types(ray_session):
    tbl = pa.table(
        {
            "x": pa.array([1, None, 3, None, 5], type=pa.int64()),
            "s": pa.array(["ab", None, "", "abcd", "x"], type=pa.string()),
            "f": pa.array([1.5, 2.5, None, None, None], type=pa.float64()),
        }
    )
    out = (
        profile_table(ray.data.from_arrow(tbl).repartition(3))
        .to_pandas()
        .set_index("column")
    )
    assert out.loc["x", "n_rows"] == 5 and out.loc["x", "n_nulls"] == 2
    assert out.loc["x", "vmin"] == 1.0 and out.loc["x", "vmax"] == 5.0
    assert out.loc["x", "vmean"] == 3.0
    assert out.loc["x", "approx_distinct"] == 3  # exact regime at tiny n
    assert out.loc["s", "n_nulls"] == 1
    assert out.loc["s", "len_min"] == 0 and out.loc["s", "len_max"] == 4
    assert out.loc["s", "len_mean"] == round(7 / 4, 4)
    assert out.loc["f", "vmean"] == 2.0
    assert out.loc["f", "len_min"] == 0  # non-string default


def test_profile_all_null_column(ray_session):
    tbl = pa.table({"x": pa.array([None, None], type=pa.int64())})
    out = profile_table(ray.data.from_arrow(tbl)).to_pandas().set_index("column")
    assert out.loc["x", "n_nulls"] == 2
    assert out.loc["x", "approx_distinct"] == 0
    assert out.loc["x", "vmin"] == 0.0 and out.loc["x", "vmax"] == 0.0
