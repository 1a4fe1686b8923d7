"""Golden-oracle parity: the Ray pipelines must equal the sequential
single-process golden implementations (tools/make_golden.py) — the
hard-oracle gate for the queries DuckDB cannot express.  Runs at
sf0.001 so every pytest run re-derives the goldens from scratch; the
checked-in golden/sf0.01 parquet used by the driver's DuckDB oracle is
produced by the same builders."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


def _canon(obj) -> pd.DataFrame:
    if isinstance(obj, ray.data.Dataset):
        df = obj.to_pandas()
    elif isinstance(obj, pa.Table):
        df = obj.to_pandas()
    else:
        df = obj
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    [
        "describe_docs",
        "kmeans_clusters",
        "semdedup_docs",
        "dsir_scores",
        "dsir_sample",
        "incremental_minhash",
        "host_pagerank",
        "host_hits",
        "host_trustrank",
        "host_kcore",
        "cms_token_counts",
        "cdc_dedup_stats",
        "corpus_overlap",
        "chars_quantiles_approx",
        "dedup_minhash",
        "dedup_best_survivors",
        "containment_pairs",
        "dedup_simhash",
        "dedup_ngram",
        "dedup_embedding",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "ann_pq_topk",
        "lang_id_confusion",
        "fingerprint_dups",
        "merge_docs",
        "approx_distinct_users",
        "reservoir_doc_sample",
        "compression_ratios",
        "host_templates",
        "table_profile",
        "bpe_merges",
        "bpe_token_stats",
        "bpe_piece_vocab",
        "logreg_weights",
        "logreg_scores",
        "pca_components",
        "pca_projected",
        "host_communities",
        "host_random_walks",
        "host_scc",
        "host_harmonic",
        "host_betweenness",
        "shard_plan",
        "dedup_eval",
        "bitext_mining",
        "isotonic_calibration",
        "sq8_recall",
        "kcenter_prototypes",
        "knn_outliers",
        "stemmed_vocab",
        "media_phash_dups",
        "snm_dedup",
        "coverage_select",
        "hac_dendrogram",
        "kappa_lang_id",
        "jw_vocab_pairs",
    ],
)
def test_golden_parity(ray_session, name):
    import __ray_entry__ as entry
    from tools.make_golden import GOLDEN_BUILDERS

    engine = _canon(entry.queries()[name](SF))
    golden = _canon(GOLDEN_BUILDERS[name](SF))
    assert list(engine.columns) == list(golden.columns)
    assert len(engine) == len(golden)
    pd.testing.assert_frame_equal(engine, golden, check_dtype=False)
